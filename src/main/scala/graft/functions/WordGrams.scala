package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_word_grams(words, n) — positional word n-grams of a pre-split
  * words array, as array<string>: the native spelling of
  *
  *   when(size(w) - (n-1) >= 1,
  *     transform(sequence(1, size(w) - (n-1)),
  *       i => concat_ws(" ", element_at(w, i), ..., element_at(w, i+n-1))))
  *     .otherwise(array())
  *
  * which is Dedup.gramsOfWords — the tokenizer every shingle/gram consumer
  * (prefix-filter dedup, MinHash, jaccard, dup-span stats) funnels
  * through. The HOF chain evaluates INTERPRETED (higher-order functions
  * are CodegenFallback) with a lambda dispatch plus n element_at calls
  * and a fresh ConcatWs evaluation per emitted gram — measured as the
  * dominant per-task CPU of the text-dedup family at sf0.1 (t53/t56/t57
  * ≈ 4-10 s summed task time each). This single pass reads each word
  * once into a local array and emits one UTF8String per gram.
  *
  * Exact HOF-chain semantics preserved:
  *  - grams in starting-position order, duplicates preserved;
  *  - fewer than n words (or a NULL words array: size(NULL) is NULL, so
  *    the `when` falls through) → EMPTY array, never null;
  *  - NULL elements are skipped by the separator join exactly as
  *    concat_ws skips them (UTF8String.concatWs is the same kernel the
  *    ConcatWs expression uses for string-only children).
  */
case class WordGrams(words: Expression, nLit: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = words
  override def right: Expression = nLit

  override def prettyName: String = "graft_word_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!nLit.foldable)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) gram size")
    (words.dataType, nLit.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (n >= 1)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires n >= 1, got $n")
      case (w, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, int), got " +
            s"(${w.catalogString}, ${i.catalogString})")
    }
  }

  @transient private lazy val n: Int =
    nLit.eval().asInstanceOf[Number].intValue

  @transient private lazy val sep: UTF8String = UTF8String.fromString(" ")

  @transient private lazy val empty: ArrayData =
    new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val wAny = words.eval(input)
    if (wAny == null) return empty
    val ad = wAny.asInstanceOf[ArrayData]
    val sz = ad.numElements()
    val cnt = sz - (n - 1)
    if (cnt < 1) return empty
    // read each word once; grams re-slice this local array
    val ws = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      if (!ad.isNullAt(i)) ws(i) = ad.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](cnt)
    i = 0
    while (i < cnt) {
      if (n == 1) {
        // concat_ws of a single element: "" when null, else the element
        out(i) = if (ws(i) == null) UTF8String.EMPTY_UTF8 else ws(i)
      } else {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = ws(i + k); k += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGrams =
    copy(words = newLeft, nLit = newRight)
}
