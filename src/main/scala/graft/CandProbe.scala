package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the t55/t40 candidate-distinct question (VERDICT r13
  * #2): how many RAW prefix-collision rows feed the candidate distinct,
  * how many distinct pairs leave it, and what each phase costs — the
  * numbers that decide between keeping the distinct and verifying
  * duplicated candidates directly.
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (tn, td) = if (args.length >= 2) (args(0).toInt, args(1).toInt) else (2, 5)
    println(s"tau=$tn/$td")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val sh = graft.ext.Dedup.shingleHashTable(docs, col("doc_id"), col("text"))
    val pref = graft.ext.Dedup.prefixIndexTable(sh, tn, td).localCheckpoint()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val candRaw = pref.as("p").join(pref.as("f"),
        col("p.h") === col("f.h") && col("p.doc") < col("f.doc"))
      .filter(col("p.n_sh") * td >= col("f.n_sh") * tn &&
        col("f.n_sh") * td >= col("p.n_sh") * tn)
      .select(col("p.doc").as("id_a"), col("f.doc").as("id_b"))
    val raw = timed("raw candidate rows")(candRaw.count())
    val dis = timed("distinct pairs")(candRaw.distinct().count())
    println(s"raw=$raw distinct=$dis dup_factor=${raw.toDouble / dis}")
    // phase costs: distinct-then-verify vs verify-duplicated-then-distinct
    val sigs = graft.ext.Dedup.signatureTable(sh).localCheckpoint()
    graft.functions.GraftFunctions.register(spark)
    def verify(c: org.apache.spark.sql.DataFrame) = c
      .join(broadcast(sigs.select(col("doc").as("id_a"), col("hs").as("ha"))), "id_a")
      .join(broadcast(sigs.select(col("doc").as("id_b"), col("hs").as("hb"))), "id_b")
      .select(col("id_a"), col("id_b"),
        call_function("graft_sorted_intersect_count",
          col("ha"), col("hb")).as("n_inter"),
        size(col("ha")).cast("long").as("n_a"),
        size(col("hb")).cast("long").as("n_b"))
      .filter(col("n_inter") * (td + tn) >= (col("n_a") + col("n_b")) * tn)
    timed("A: distinct -> verify") {
      verify(candRaw.distinct()).write.format("noop").mode("overwrite").save()
    }
    timed("B: verify duplicated -> distinct") {
      verify(candRaw).distinct().write.format("noop").mode("overwrite").save()
    }
    timed("A2: distinct -> verify (repeat)") {
      verify(candRaw.distinct()).write.format("noop").mode("overwrite").save()
    }
    timed("B2: verify duplicated -> distinct (repeat)") {
      verify(candRaw).distinct().write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
