package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Parity pins for the r16 native PCM16 kernels: each kernel-backed
  * operator must reproduce the per-sample explode formulation it
  * replaced, bit for bit, on crafted WAV streams covering the edges —
  * empty data section, a single sample (ns = 1 → absent from zcr/delta),
  * trailing odd byte (ignored), DC bias, real negative (≥ 0x8000)
  * samples, and multi-frame clips.
  */
class Pcm16Spec extends SparkSpec {
  import spark.implicits._

  // clips as raw payload bytes (the data section); the WAV header is
  // built by the same in-plan builder the queries use
  private def clips: DataFrame = {
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      (1L, Array.empty[Byte]),                       // ns = 0
      (2L, Array[Byte](10, 0)),                       // ns = 1
      (3L, Array[Byte](10, 0, 5)),                    // odd byte -> ns = 1
      (4L, Array[Byte](1, 0, 2, 0, 3, 0, 4, 0)),      // small positives
      // negative samples: 0xFF 0x7F = 32767; 0x00 0x80 = -32768
      (5L, Array[Byte](-1, 127, 0, -128, 0, 0, -1, -1)),
      // > 64 samples so the frame index advances (n=65 samples)
      (6L, Array.tabulate(130)(i => (i % 7).toByte)))
    payloads.toDF("doc_id", "payload")
  }

  private def withMedia(df: DataFrame): DataFrame =
    df.withColumn("media",
      concat(Multimodal.wavHeader(lit(8000), lit(1), lit(16),
        length(col("payload"))), col("payload")))

  // ---- the pre-r16 explode formulations, verbatim, as references ----

  private def leInt(media: Column, off: Int, n: Int): Column = {
    val h = hex(substring(media, off, n))
    val reversed = concat((n - 1 to 0 by -1).map(i =>
      substring(h, i * 2 + 1, 2)): _*)
    conv(reversed, 16, 10).cast("long")
  }

  private def refFrameRms(df: DataFrame, frameSamples: Int = 64): DataFrame = {
    val ns = (leInt(col("media"), 41, 4) / lit(2)).cast("long")
    val byteAt = (pos: Column) =>
      conv(hex(col("__m").substr(pos, lit(1))), 16, 10).cast("long")
    df.select(col("doc_id").as("id"), col("media").as("__m"), ns.as("__ns"))
      .filter(col("__ns") > 0)
      .select(col("id"), col("__m"),
        explode(sequence(lit(0L), col("__ns") - 1)).as("__i"))
      .withColumn("__u",
        byteAt(lit(46) + col("__i") * 2) * 256 +
          byteAt(lit(45) + col("__i") * 2))
      .withColumn("__s",
        col("__u") - when(col("__u") >= 32768, 65536L).otherwise(0L))
      .groupBy(col("id"), (col("__i") / frameSamples).cast("int").as("frame"))
      .agg(count(lit(1)).as("n_samples"),
        sqrt(sum(col("__s") * col("__s")).cast("double") / count(lit(1)))
          .as("rms"))
  }

  private def refZeroCrossings(df: DataFrame): DataFrame = {
    val ns = (leInt(col("media"), 41, 4) / lit(2)).cast("long")
    val byteAt = (pos: Column) =>
      conv(hex(col("__m").substr(pos, lit(1))), 16, 10).cast("long")
    def signed(u: Column): Column =
      u - when(u >= 32768, 65536L).otherwise(0L)
    df.select(col("doc_id").as("id"), col("media").as("__m"), ns.as("__ns"))
      .filter(col("__ns") > 1)
      .withColumn("__tot", aggregate(
        sequence(lit(0L), col("__ns") - 1), lit(0L),
        (acc, i) => acc + signed(byteAt(lit(46) + i * 2) * 256 +
          byteAt(lit(45) + i * 2))))
      .select(col("id"), col("__m"), col("__ns"), col("__tot"),
        explode(sequence(lit(1L), col("__ns") - 1)).as("__i"))
      .withColumn("__u", signed(
        byteAt(lit(46) + col("__i") * 2) * 256 +
          byteAt(lit(45) + col("__i") * 2)))
      .withColumn("__v", signed(
        byteAt(lit(44) + col("__i") * 2) * 256 +
          byteAt(lit(43) + col("__i") * 2)))
      .withColumn("__c",
        ((col("__u") * col("__ns") > col("__tot")) =!=
          (col("__v") * col("__ns") > col("__tot"))).cast("long"))
      .groupBy(col("id"))
      .agg((count(lit(1)) + 1).as("n_samples"),
        sum(col("__c")).as("crossings"),
        (sum(col("__c")).cast("double") / count(lit(1))).as("zcr"))
  }

  private def refDeltaAudit(df: DataFrame): DataFrame = {
    val ns = (leInt(col("media"), 41, 4) / lit(2)).cast("long")
    val byteAt = (pos: Column) =>
      conv(hex(col("__m").substr(pos, lit(1))), 16, 10).cast("long")
    def signed(u: Column): Column =
      u - when(u >= 32768, 65536L).otherwise(0L)
    df.select(col("doc_id").as("id"), col("media").as("__m"), ns.as("__ns"))
      .filter(col("__ns") > 1)
      .select(col("id"), col("__m"),
        explode(sequence(lit(1L), col("__ns") - 1)).as("__i"))
      .withColumn("__u", signed(
        byteAt(lit(46) + col("__i") * 2) * 256 +
          byteAt(lit(45) + col("__i") * 2)))
      .withColumn("__v", signed(
        byteAt(lit(44) + col("__i") * 2) * 256 +
          byteAt(lit(43) + col("__i") * 2)))
      .withColumn("__d", abs(col("__u") - col("__v")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_deltas"),
        max(col("__d")).as("max_abs_delta"),
        (sum(col("__d")).cast("double") / count(lit(1))).as("mean_abs_delta"),
        length(bin(max(col("__d")))).cast("int").as("delta_bits"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Pcm16Frames kernel == explode formulation (wavFrameRms)") {
    val m = withMedia(clips)
    val got = Multimodal.wavFrameRms(m, col("doc_id"), col("media"))
    assert(sortedRows(got) == sortedRows(refFrameRms(m)))
    // ns=0 clip absent; 65-sample clip spans two frames
    assert(got.filter(col("id") === 1L).count() == 0)
    assert(got.filter(col("id") === 6L).count() == 2)
  }

  test("Pcm16Zcr kernel == explode formulation (wavZeroCrossings)") {
    val m = withMedia(clips)
    val got = Multimodal.wavZeroCrossings(m, col("doc_id"), col("media"))
    assert(sortedRows(got) == sortedRows(refZeroCrossings(m)))
    // ns <= 1 clips absent (ids 1, 2, 3)
    assert(got.filter(col("id").isin(1L, 2L, 3L)).count() == 0)
  }

  test("Pcm16Delta kernel == explode formulation (wavDeltaAudit)") {
    val m = withMedia(clips)
    val got = Multimodal.wavDeltaAudit(m, col("doc_id"), col("media"))
    assert(sortedRows(got) == sortedRows(refDeltaAudit(m)))
    assert(got.filter(col("id").isin(1L, 2L, 3L)).count() == 0)
  }
}
