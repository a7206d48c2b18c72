package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import scala.util.Random

/** Deterministic climate fixture generator (FIXTURES.md §A): the
  * reference's raw input formats with the REAL 6-token Berkeley layout
  * (the reference's own fallback generator emits 5 tokens and parses to an
  * empty table — SURVEY.md §1.4; we generate the normative format) and the
  * real GHCND fixed-width offsets.
  *
  * Seeded (42) → byte-identical across runs; includes malformed rows to
  * exercise the cast→null→dropna paths.
  */
object ClimateFixture {

  val startYear = 1998        // pre-2000 rows exercise the year >= 2000 filter
  val endYear   = 2004
  val nStations = 12

  def berkeleyText: String = berkeleyTextFor(startYear, endYear)

  def berkeleyTextFor(fromYear: Int, toYear: Int): String = {
    val rnd = new Random(42)
    val sb  = new StringBuilder
    sb ++= "% Berkeley Earth daily TAVG fixture (seeded, deterministic)\n"
    sb ++= "% date-number  year  month  day  day-of-year  anomaly\n"
    var d = LocalDate.of(fromYear, 1, 1)
    val end = LocalDate.of(toYear, 12, 31)
    while (!d.isAfter(end)) {
      val anom = rnd.nextDouble() * 4.0 - 2.0
      // Locale.ROOT: the f-interpolator's %f is locale-sensitive (comma
      // decimals on e.g. de_DE would break the parser and the goldens)
      sb ++= String.format(java.util.Locale.ROOT,
        "  %d.%03d  %d  %2d  %2d  %3d  %.3f%n".replace("%n", "\n"),
        d.getYear, d.getDayOfYear, d.getYear, d.getMonthValue,
        d.getDayOfMonth, d.getDayOfYear, anom)
      d = d.plusDays(1)
    }
    // malformed rows: short line (token 5 out of range) and non-numeric year
    sb ++= "  2001.001  2001  1\n"
    sb ++= "  bad.row  YEAR  1  1  1  0.5\n"
    sb.result()
  }

  def stationsText: String = stationsTextFor(nStations)

  def stationsTextFor(n: Int): String = {
    val rnd = new Random(43)
    val sb  = new StringBuilder
    for (i <- 0 until n) {
      val id   = f"USW000${i}%05d"
      val lat  = 25.0 + rnd.nextDouble() * 25.0
      val lon  = -125.0 + rnd.nextDouble() * 60.0
      val elev = rnd.nextInt(3000).toDouble
      val state = if (i % 5 == 4) "  " else Seq("NY", "CA", "TX", "WA")(i % 4)
      val name  = s"TEST_STATION_$i"
      // real GHCND offsets: id 1-11, lat 13-20, lon 22-30, elev 32-37,
      // state 39-40, name 42-71; Locale.ROOT for the float fields
      sb ++= String.format(java.util.Locale.ROOT,
        "%-11s %8.4f %9.4f %6.1f %2s %-30s\n",
        id, lat, lon, elev, state, name)
    }
    // malformed: blank lat/lon → cast null → dropped by silver validation
    sb ++= f"USW00099999 ${" " * 8}%s ${" " * 9}%s  100.0 NY BLANK_COORDS${" " * 17}%s\n"
    sb.result()
  }

  /** Write both fixture files into `dir` (created if needed); idempotent,
    * but rewrites when the generator output changed — stale on-disk
    * fixtures must never validate new code.
    */
  def writeTo(dir: String): (String, String) = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val b = d.resolve("berkeley_daily.txt")
    val s = d.resolve("ghcnd_stations.txt")
    writeIfChanged(b, berkeleyText)
    writeIfChanged(s, stationsText)
    (b.toString, s.toString)
  }

  /** Default shared fixture location under the repo's (gitignored) target
    * dir (deterministic content → safe to reuse across runs; absolute path
    * so the DuckDB oracle resolves it too).
    */
  lazy val default: (String, String) = synchronized {
    writeTo(sys.props("user.dir") + "/target/graft-climate-fixture")
  }

  private def writeIfChanged(p: Path, content: String): Unit =
    if (!Files.exists(p) || Files.readString(p) != content)
      Files.writeString(p, content)
}
