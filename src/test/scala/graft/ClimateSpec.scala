package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Climate, ClimateFixture}
import graft.sources.Sinks

/** Golden + property tests for the flagship climate pipeline, covering the
  * sharp edges from SURVEY.md §5: malformed-row dropping, fixed-width
  * offsets, the station×day grain quirk, injection overrides, extremes
  * labeling, and the medallion parquet flow.
  */
class ClimateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val goldTables: Climate.Gold = {
    val (b, st) = ClimateFixture.default
    Climate.run(spark, b, st)
  }

  // fixture facts: 1998-2004 daily (leap 2000, 2004) + 2 malformed rows
  private val allDays  = 365 * 7 + 2   // 2557
  private val factDays = 365 * 5 + 2   // 1827 (year >= 2000)

  test("berkeley silver: malformed rows and comments dropped, exact count") {
    val (b, st) = ClimateFixture.default
    val silver = Climate.berkeleySilver(Climate.ingestText(spark, b, "t"))
    assert(silver.count() == allDays)
    assert(silver.columns.toSeq == Seq("year", "month", "day", "anomaly"))
  }

  test("stations silver: blank-coordinate row dropped, offsets parse") {
    val (_, st) = ClimateFixture.default
    val silver = Climate.stationsSilver(Climate.ingestText(spark, st, "t"))
    assert(silver.count() == ClimateFixture.nStations)
    val first = silver.orderBy("station_id").collect().head
    assert(first.getString(0) == "USW00000000")
    assert(first.getString(5).startsWith("TEST_STATION_"))
  }

  test("kpis: one row per year, station_count literal, golden avg for 2000") {
    val k = goldTables.kpis.orderBy("year").collect()
    assert(k.length == 7)
    assert(k.forall(_.getLong(5) == ClimateFixture.nStations.toLong))
    // independent golden: parse the fixture text in plain Scala
    val rows = ClimateFixture.berkeleyText.linesIterator
      .filterNot(_.trim.startsWith("%"))
      .map(_.trim.split("\\s+"))
      .filter(p => p.length > 5 && p(1) == "2000")
      .map(p => p(5).toFloat.toDouble).toSeq
    val expAvg = BigDecimal(rows.sum / rows.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = k.find(_.getInt(0) == 2000).get.getDouble(1)
    assert(math.abs(got - expAvg) < 1e-9, s"avg 2000: $got vs $expAvg")
  }

  test("fact: station×day grain (SURVEY §2.10), constant record_count 30") {
    val f = goldTables.fact
    assert(f.count() == factDays.toLong * ClimateFixture.nStations)
    assert(f.select("record_count").distinct().as[Int].collect().toSeq == Seq(30))
    assert(f.filter(col("year") < 2000).count() == 0)
    // day is dropped but not aggregated: every (station, year, month) has
    // ~28-31 rows
    val perMonth = f.groupBy("station_id", "year", "month").count()
    assert(perMonth.filter(col("count") < 28 || col("count") > 31).count() == 0)
  }

  test("fact: baseline = round(30 - 0.5*abs(lat), 2)") {
    val bad = goldTables.fact
      .withColumn("expected", round(lit(30.0) - lit(0.5) * abs(col("latitude")), 2))
      .filter(col("baseline_temperature") =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("fact: injected rows have z pinned to ±5.0 and |noise| = 15") {
    val f = goldTables.fact
    val injected = f.filter(abs(col("z_score")) === 5.0)
    assert(injected.count() > 0, "fixture must hit both injection branches")
    // injected z implies temperature_anomaly deviates by ±15 from global
    val heat = f.filter(col("z_score") === 5.0).count()
    val cold = f.filter(col("z_score") === -5.0).count()
    assert(heat > 0 && cold > 0)
  }

  test("extremes: subset of fact, |z| >= 2.5, labels match sign") {
    val e = goldTables.extremes
    assert(e.count() > 0)
    assert(e.filter(abs(col("z_score")) < 2.5).count() == 0)
    assert(e.filter(col("z_score") > 0 && col("event_type") =!= "EXTREME_HEAT").count() == 0)
    assert(e.filter(col("z_score") < 0 && col("event_type") =!= "EXTREME_COLD").count() == 0)
    assert(e.columns.toSeq == Seq("date", "station_id", "location",
      "temperature_anomaly", "z_score", "event_type"))
  }

  test("medallion flow: bronze/silver/gold parquet + single-file CSV export") {
    val dir = java.nio.file.Files.createTempDirectory("graft_medallion").toString
    val (b, st) = ClimateFixture.default
    // bronze
    Sinks.parquetOverwrite(Climate.ingestText(spark, b, "Berkeley_Earth"), s"$dir/bronze/berkeley")
    val bronze = spark.read.parquet(s"$dir/bronze/berkeley")
    assert(bronze.columns.toSeq == Seq("value", "ingestion_date", "source"))
    // silver
    Sinks.parquetOverwrite(Climate.berkeleySilver(bronze), s"$dir/silver/berkeley")
    val silver = spark.read.parquet(s"$dir/silver/berkeley")
    assert(silver.count() == allDays)
    // gold csv export: exactly one part file, header present
    Sinks.singleFileCsv(goldTables.kpis, s"$dir/gold/kpis_csv")
    val csvs = new java.io.File(s"$dir/gold/kpis_csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(csvs.length == 1)
    val header = scala.util.Using(scala.io.Source.fromFile(csvs.head))(
      _.getLines().next()).get
    assert(header == "year,avg_global_anomaly,max_anomaly,min_anomaly,std_dev_anomaly,station_count")
  }

  test("zscore parity: fact z matches direct recomputation (unrounded path)") {
    // recompute per-station mean/std of temperature_anomaly and check the
    // non-overridden rows round-trip to the stored z (3 decimals)
    val f = goldTables.fact
    val stats = f.groupBy(col("station_id").as("sid"))
      .agg(avg("temperature_anomaly").as("m"), stddev("temperature_anomaly").as("s"))
    // tolerance compare on the unrounded quotient: the pipeline's window
    // aggregate and this groupBy aggregate sum in different orders, so a
    // rounded-equality check would flake on values near a .0005 boundary
    val joined = f.join(stats, f("station_id") === col("sid"))
      .filter(abs(col("z_score")) =!= 5.0)
      .withColumn("z2", (col("temperature_anomaly") - col("m")) / col("s"))
      .filter(abs(col("z_score") - col("z2")) > 6e-4)
    assert(joined.count() == 0)
  }
}
