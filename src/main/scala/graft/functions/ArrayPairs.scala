package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** graft_pairs(items) — all ordered pairs (src, dst) of DISTINCT-VALUED
  * elements of `items`, as array<struct<src, dst>>: the native spelling of
  *
  *   flatten(transform(items, x =>
  *     transform(filter(items, y => y =!= x), y => struct(x, y))))
  *
  * which is the co-occurrence pair fan-out (Graph.coOccurrenceEdges). The
  * HOF chain evaluates INTERPRETED (higher-order functions are
  * CodegenFallback) with per-element lambda dispatch plus three
  * intermediate array materializations per outer element — measured as
  * the dominant task CPU of the whole graph family at sf0.1 (q63/q84/
  * q102/q127/q132 ≈ 10-13 s summed task-time each). This single pass
  * allocates one struct per emitted pair and nothing else.
  *
  * Exact HOF-chain semantics preserved: outer order = items order, inner
  * order = items order; a pair is skipped when the two elements are equal
  * BY VALUE (the `y =!= x` predicate — on collect_set input value-equal
  * means same index, but the general contract is kept); a NULL element
  * yields no pairs as src (NULL predicate filters everything) and is
  * skipped as dst. Downstream consumers aggregate, so pair ORDER inside
  * the array is irrelevant to results — but it matches the HOF chain
  * anyway.
  *
  * The expression itself is CodegenFallback (the array-of-struct build
  * has no profitable codegen form); the win is removing the per-element
  * lambda interpretation, not the fallback boundary.
  */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_pairs"

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("src", elemType), StructField("dst", elemType))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _)
          if !et.isInstanceOf[ArrayType] && !et.isInstanceOf[MapType] &&
            !et.isInstanceOf[StructType] && et != NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<atomic>, got ${t.catalogString}")
    }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(items: Any): Any = {
    val ad = items.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n * n)
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val x = ad.get(i, elemType)
        var j = 0
        while (j < n) {
          if (j != i && !ad.isNullAt(j)) {
            val y = ad.get(j, elemType)
            if (!ordering.equiv(x, y))
              out += new GenericInternalRow(Array[Any](x, y))
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}
