package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}
import graft.functions.GraftFunctions

/** Parity + behavior tests for the native fused MinHash expression:
  * it must be bit-identical to the built-in-only formulation
  * `min(hash(shingle, lit(i)))` it replaced, in both interpreted eval and
  * whole-stage codegen paths.
  */
class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "spark catalyst optimizer rewrites logical plans into physical plans"),
    (3L, "xy")  // < 3 words -> empty shingle set
  ).toDF("doc_id", "text")

  test("fused expression == builtin min(hash(shingle, i)) per permutation") {
    GraftFunctions.register(spark)
    // builtin-only reference: explode + 64 min-aggregates
    val sh = docs.select(col("doc_id").as("doc"), TextOps.words(col("text")).as("w"))
      .select(col("doc"), explode(Dedup.shinglesOfWords(col("w"))).as("sh"))
    val ref = sh.groupBy("doc").agg(
      min(hash(col("sh"), lit(0))).as("mh0"),
      (1 until 64).map(i => min(hash(col("sh"), lit(i))).as(s"mh$i")): _*)
    val refMap = ref.collect().map(r =>
      r.getLong(0) -> (0 until 64).map(i => r.getInt(i + 1))).toMap

    val fused = Dedup.minhashSignature(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    // doc 3 has no shingles: builtin agg emits no row; fused emits MaxValue
    assert(fused(1L) == refMap(1L))
    assert(fused(2L) == refMap(2L))
    assert(fused(3L).forall(_ == Int.MaxValue))
  }

  test("codegen and interpreted paths agree") {
    GraftFunctions.register(spark)
    val arr = Dedup.shinglesOfWords(TextOps.words(col("text")))
    val viaCodegen = docs
      .select(call_function("graft_minhash", arr).as("sig"))
      .collect().map(_.getSeq[Int](0))
    // force interpreted path, restoring whatever was set before
    val prevWS = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFM = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp = try docs
      .select(call_function("graft_minhash", arr).as("sig"))
      .collect().map(_.getSeq[Int](0))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWS)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
    assert(viaCodegen.toSeq == viaInterp.toSeq)
  }

  test("band expression groups identical docs into identical buckets") {
    GraftFunctions.register(spark)
    val two = Seq((1L, "same words here exactly"), (2L, "same words here exactly"))
      .toDF("doc_id", "text")
    val b = two.select(col("doc_id"),
      call_function("graft_minhash_bands",
        Dedup.shinglesOfWords(TextOps.words(col("text")))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(b(1L) == b(2L) && b(1L).length == 16)
  }

  test("SQL surface: graft_minhash callable from spark.sql") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val n = spark.sql(
      "SELECT size(graft_minhash(split(lower(text), ' '))) AS s FROM mh_docs")
      .as[Int].collect()
    assert(n.forall(_ == 64))
  }
}
