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
      sb ++= f"  ${d.getYear}%d.${d.getDayOfYear}%03d  ${d.getYear}%d  ${d.getMonthValue}%2d  ${d.getDayOfMonth}%2d  ${d.getDayOfYear}%3d  $anom%.3f\n"
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
      val name  = f"TEST_STATION_$i%d"
      // real GHCND offsets: id 1-11, lat 13-20, lon 22-30, elev 32-37,
      // state 39-40, name 42-71
      sb ++= f"$id%-11s $lat%8.4f $lon%9.4f $elev%6.1f $state%2s $name%-30s\n"
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
