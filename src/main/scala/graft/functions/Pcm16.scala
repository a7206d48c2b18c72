package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native single-pass kernels over canonical 44-byte-header PCM16 WAV
  * byte streams — the map-side replacement for the media family's
  * explode-per-sample pipelines (m06/m08/m10/m11), whose per-row cost
  * was four `conv(hex(substr(media, pos, 1)), 16, 10)` byte reads (each
  * allocating two strings) plus, for the zero-crossing query, an
  * interpreted `aggregate(sequence(0, ns-1), ...)` fold re-decoding the
  * whole clip per clip (guide §4: non-codegen expressions in the hot
  * path). Each kernel decodes every sample exactly once with integer
  * arithmetic on the raw bytes.
  *
  * Byte layout (same as Multimodal.wavFrameRms/wavZeroCrossings/
  * wavDeltaAudit): data-section length = little-endian uint32 at byte
  * offset 40 (0-based), ns = dataLen / 2 full samples; sample i =
  * b[44+2i] + 256·b[45+2i] (unsigned), signed via two's complement
  * u − 65536·[u ≥ 2¹⁵]. Preconditions are the ones the header builder
  * guarantees (dataLen == payload bytes); all sums fit a long by
  * construction (|s| ≤ 2¹⁵, frame ≤ 2³⁰ samples).
  */
private[functions] object Pcm16 {
  /** ns (full int16 sample count) from the header, or -1 if the stream
    * is shorter than header + data (malformed — never happens with the
    * in-plan wavHeader builder). */
  def sampleCount(m: Array[Byte]): Long = {
    if (m.length < 44) return -1L
    val dataLen = (m(40) & 0xFFL) | ((m(41) & 0xFFL) << 8) |
      ((m(42) & 0xFFL) << 16) | ((m(43) & 0xFFL) << 24)
    val ns = dataLen / 2
    if (44 + 2 * ns > m.length) -1L else ns
  }

  @inline def sample(m: Array[Byte], i: Long): Long = {
    val off = 44 + 2 * i.toInt
    val u = (m(off) & 0xFFL) | ((m(off + 1) & 0xFFL) << 8)
    if (u >= 32768L) u - 65536L else u
  }
}

/** graft_pcm16_frames(media, frameSamples) →
  * array<struct<frame:int, n:bigint, sumsq:bigint>> — per-frame sample
  * count and Σs², the integer core of wavFrameRms (m06/m08); callers
  * compute rms = sqrt(sumsq / n) after the explode, exactly the double
  * the per-sample aggregate produced (the integer sum is order-free).
  * Empty/short data sections yield an EMPTY array (the `ns > 0` filter
  * + explode of the old shape); a malformed stream yields null.
  */
case class Pcm16Frames(media: Expression, frameLit: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = media
  override def right: Expression = frameLit
  override def prettyName: String = "graft_pcm16_frames"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("frame", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("sumsq", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!frameLit.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable frame size")
    (media.dataType, frameLit.dataType) match {
      case (BinaryType, IntegerType) if frameSamples >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int >= 1)")
    }
  }

  @transient private lazy val frameSamples: Int =
    frameLit.eval().asInstanceOf[Number].intValue

  override def nullSafeEval(mAny: Any, fAny: Any): Any = {
    val m = mAny.asInstanceOf[Array[Byte]]
    val ns = Pcm16.sampleCount(m)
    if (ns < 0) return null
    if (ns == 0) return new GenericArrayData(Array.empty[Any])
    val nFrames = ((ns - 1) / frameSamples).toInt + 1
    val counts = new Array[Long](nFrames)
    val sumsq = new Array[Long](nFrames)
    var i = 0L
    while (i < ns) {
      val s = Pcm16.sample(m, i)
      val f = (i / frameSamples).toInt
      counts(f) += 1
      sumsq(f) += s * s
      i += 1
    }
    val out = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      out(f) = new GenericInternalRow(Array[Any](f, counts(f), sumsq(f)))
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Pcm16Frames =
    copy(media = newLeft, frameLit = newRight)
}

/** graft_pcm16_zcr(media) → struct<n_samples:bigint, crossings:bigint> —
  * the whole m10 zero-crossing computation in one pass: tot = Σs, then
  * crossings = #{i ≥ 1 : (n·sᵢ > tot) ≠ (n·sᵢ₋₁ > tot)} — the identical
  * integer cross-multiplication test, so counts are bit-exact. Returns
  * null when ns ≤ 1 (the old `__ns > 1` filter) or malformed.
  */
case class Pcm16Zcr(media: Expression)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = media
  override def prettyName: String = "graft_pcm16_zcr"
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("crossings", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = media.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullSafeEval(mAny: Any): Any = {
    val m = mAny.asInstanceOf[Array[Byte]]
    val ns = Pcm16.sampleCount(m)
    if (ns <= 1) return null
    var tot = 0L
    var i = 0L
    while (i < ns) { tot += Pcm16.sample(m, i); i += 1 }
    var crossings = 0L
    var prevHigh = Pcm16.sample(m, 0) * ns > tot
    i = 1L
    while (i < ns) {
      val high = Pcm16.sample(m, i) * ns > tot
      if (high != prevHigh) crossings += 1
      prevHigh = high
      i += 1
    }
    new GenericInternalRow(Array[Any](ns, crossings))
  }

  override protected def withNewChildInternal(newChild: Expression): Pcm16Zcr =
    copy(media = newChild)
}

/** graft_pcm16_delta(media) →
  * struct<n_deltas:bigint, max_abs:bigint, sum_abs:bigint> — m11's
  * successive-difference audit in one pass. Null when ns ≤ 1.
  */
case class Pcm16Delta(media: Expression)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = media
  override def prettyName: String = "graft_pcm16_delta"
  override def dataType: DataType = StructType(Seq(
    StructField("n_deltas", LongType, nullable = false),
    StructField("max_abs", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = media.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.catalogString}")
  }

  override def nullSafeEval(mAny: Any): Any = {
    val m = mAny.asInstanceOf[Array[Byte]]
    val ns = Pcm16.sampleCount(m)
    if (ns <= 1) return null
    var maxAbs = 0L
    var sumAbs = 0L
    var prev = Pcm16.sample(m, 0)
    var i = 1L
    while (i < ns) {
      val s = Pcm16.sample(m, i)
      val d = math.abs(s - prev)
      if (d > maxAbs) maxAbs = d
      sumAbs += d
      prev = s
      i += 1
    }
    new GenericInternalRow(Array[Any](ns - 1, maxAbs, sumAbs))
  }

  override protected def withNewChildInternal(newChild: Expression): Pcm16Delta =
    copy(media = newChild)
}
