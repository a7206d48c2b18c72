package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual named queries from [[SparkEntry.queries]]
  * (same warm-up + min-of-two protocol as [[Bench]]) without paying for
  * the full bench sweep. Usage:
  * `sbt "runMain graft.TimeQuery s07_ann_pq t06_jaccard_topk"`;
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.names.foreach { t =>
      graft.core.Tables.loadNormalized(spark, sfDir, t).limit(1).count()
    }
    SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    args.foreach { name =>
      (SparkEntry.queries ++ SparkEntry.benchOnly).get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            // noop sink, same forcing as Bench.timeOnce: count() lets the
            // optimizer prune un-aggregated columns (r13 census: 66/275
            // queries lost work under count())
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name: ${times.min}%.3f s (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
