package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: write `.explain("formatted")` output for named queries to
  * files — the plans/rNN/ evidence the optimization rounds commit.
  * Usage: `sbt "runMain graft.ExplainDump <outDir> <suffix> q1 q2 ..."`
  * writes `<outDir>/<query>_<suffix>.txt` for each query (suffix =
  * before/after). SPARK_GRAFT_SF_DIR / _CPUS as in Bench.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val reg = SparkEntry.queries ++ SparkEntry.benchOnly
    names.foreach { name =>
      reg.get(name) match {
        case None => System.err.println(s"[explain] $name: UNKNOWN")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
            println(s"[explain] wrote $outDir/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
