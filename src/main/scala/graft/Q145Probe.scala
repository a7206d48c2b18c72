package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q145_skew_profile's sf10 time go? Phases:
  * (1) stack + count-table build (the checkpoint), (2) rankViaBuckets'
  * three passes over the cached table, (3) the final per-column agg.
  */
object Q145Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val keyed = graft.core.Tables.lineitem(spark, sfDir).select(expr(
      """stack(3, 'l_orderkey', l_orderkey,
        |  'l_partkey', l_partkey,
        |  'l_suppkey', l_suppkey) AS (col_name, k)""".stripMargin))
    val cnt = timed("phase1: count-table checkpoint") {
      keyed.groupBy(col("col_name"), col("k"))
        .agg(count(lit(1)).as("c")).localCheckpoint()
    }
    println(s"cnt rows: ${cnt.count()}")
    def rankNoop(tag: String, split: Boolean): Unit =
      timed(s"$tag(split=$split)") {
        graft.ops.Prep.rankViaBuckets(cnt, col("c"), col("k"),
          ascending = true, rankCol = "i", partitionKeys = Seq(col("col_name")),
          splitTies = split)
          .write.format("noop").mode("overwrite").save()
      }
    rankNoop("phase2-valueonly-1st", split = false)
    timed("sample pass (string-cast hash TakeOrdered 50k)") {
      cnt.select(col("c").cast("double"), col("k").cast("double"))
        .orderBy(xxhash64(col("c").cast("string"), col("k").cast("string")))
        .limit(50000).collect()
    }
    timed("sample pass (native hash TakeOrdered 50k)") {
      cnt.select(col("c").cast("double"), col("k").cast("double"))
        .orderBy(xxhash64(col("c"), col("k")))
        .limit(50000).collect()
    }
    rankNoop("phase2-split-2nd", split = true)
    rankNoop("phase2-valueonly-3rd", split = false)
    rankNoop("phase2-split-4th", split = true)
    spark.stop()
  }
}
