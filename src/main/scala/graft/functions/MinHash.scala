package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Fused MinHash as a native codegen'd Catalyst Expression — the
  * (b)-path accelerator from the build guidance (custom Expression beats
  * UDF beats everything else).
  *
  * Computes, in ONE pass over a document's shingle array, the minimum of
  * murmur3(shingle, seed=i) for each of k permutations — bit-identical to
  * the built-in-only formulation `min(hash(shingle, lit(i)))` per i
  * (Spark's hash() folds: h=42; h=hashUnsafeBytes(str,h); h=hashInt(i,h);
  * verified in MinHashExprSpec), but with no explode, no 64-column
  * aggregate, and NO SHUFFLE: the signature is a per-row projection.
  *
  * At 100 TB this turns MinHash signatures from a (rows × shingles)
  * shuffle-aggregate into a map-only scan — the aggregation shuffle was
  * the dominant cost of the built-in version.
  */
abstract class MinHashBase extends UnaryExpression {
  def k: Int
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  /** One pass: mins(i) = min over shingles of hashInt(i, murmur3(bytes, 42)). */
  protected final def computeMins(arr: ArrayData): Array[Int] = {
    val mins = Array.fill(k)(Int.MaxValue)
    var j = 0
    val nElems = arr.numElements()
    while (j < nElems) {
      if (!arr.isNullAt(j)) {
        val s  = arr.getUTF8String(j)
        val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
        var i = 0
        while (i < k) {
          val h2 = Murmur3_x86_32.hashInt(i, h1)
          if (h2 < mins(i)) mins(i) = h2
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  /** Shared codegen for the min-computation loop, leaving `minsVar` in scope. */
  protected final def genMins(ctx: CodegenContext, input: String, minsVar: String): String = {
    val j  = ctx.freshName("j")
    val i  = ctx.freshName("i")
    val s  = ctx.freshName("s")
    val h1 = ctx.freshName("h1")
    val h2 = ctx.freshName("h2")
    val m3 = classOf[Murmur3_x86_32].getName
    s"""
       |int[] $minsVar = new int[$k];
       |java.util.Arrays.fill($minsVar, Integer.MAX_VALUE);
       |for (int $j = 0; $j < $input.numElements(); $j++) {
       |  if (!$input.isNullAt($j)) {
       |    UTF8String $s = $input.getUTF8String($j);
       |    int $h1 = $m3.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
       |    for (int $i = 0; $i < $k; $i++) {
       |      int $h2 = $m3.hashInt($i, $h1);
       |      if ($h2 < $minsVar[$i]) $minsVar[$i] = $h2;
       |    }
       |  }
       |}
     """.stripMargin
  }
}

/** graft_minhash(shingles) → array<int> of k permutation minima. */
case class MinHashSignature(child: Expression, k: Int = 64) extends MinHashBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(computeMins(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      s"""
         |${genMins(ctx, c, mins)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** graft_minhash_bands(shingles) → array<int> of `bands` LSH bucket hashes,
  * band b = murmur3-fold (seed 42) over mins[b*r .. b*r+r-1]. Fusing the
  * banding into the expression keeps the signature single-evaluation — a
  * lambda/Project that references the signature array N times would
  * re-evaluate it N times (the HOF re-evaluation trap, see Dedup).
  */
case class MinHashBands(child: Expression, k: Int = 64, bands: Int = 16)
    extends MinHashBase {
  require(k % bands == 0, s"bands ($bands) must divide k ($k)")
  private def r = k / bands
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  private def fold(mins: Array[Int]): Array[Int] = {
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var i = b * r
      while (i < (b + 1) * r) { h = Murmur3_x86_32.hashInt(mins(i), h); i += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(fold(computeMins(input.asInstanceOf[ArrayData])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val out  = ctx.freshName("out")
      val b    = ctx.freshName("b")
      val h    = ctx.freshName("h")
      val i    = ctx.freshName("i")
      val m3   = classOf[Murmur3_x86_32].getName
      s"""
         |${genMins(ctx, c, mins)}
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $h = 42;
         |  for (int $i = $b * $r; $i < ($b + 1) * $r; $i++) {
         |    $h = $m3.hashInt($mins[$i], $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
