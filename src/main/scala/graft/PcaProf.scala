package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PcaProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
    df.count()
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $what: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("topComponent cold") { graft.ext.Similarity.topComponent(df, col("embedding")).count() }
    t("topComponent warm") { graft.ext.Similarity.topComponent(df, col("embedding")).count() }
    t("topComponent warm2") { graft.ext.Similarity.topComponent(df, col("embedding")).count() }
    spark.stop()
  }
}
