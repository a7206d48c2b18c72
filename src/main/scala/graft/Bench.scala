package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-footer costs land here, not on whichever
    // query happens to run first (measured ~6 s of pure first-query noise).
    try {
      graft.core.Tables.names.foreach { t =>
        graft.core.Tables.load(spark, sfDir, t).limit(1).count()
      }
      SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }
    // min of two runs per query: damps shared-machine load spikes without
    // hiding real cost (both runs rebuild the full plan; only JVM/codegen
    // warmth carries over, which the warm-up pass already granted).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Double.NaN
        }
      }
      // a failed query reports -1, never its time-to-exception (a broken
      // query must not read as a speedup)
      name -> (if (times.exists(_.isNaN)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
