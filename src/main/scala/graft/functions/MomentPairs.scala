package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_moment_pairs(vec) — the PCA first+second-moment fan-out as ONE
  * native pass: array<struct<j:int, k:int, p:double>> holding the d
  * first-moment entries (j, 0, xⱼ) followed by the d(d+1)/2
  * upper-triangle products (j, k, xⱼ·xₖ), j ≤ k, both 1-based. The
  * native spelling of Similarity.topComponent's phase-1 HOF chain
  *
  *   concat(transform(v, (xj, j) => struct(j+1, 0, xj)),
  *          flatten(transform(v, (xj, j) =>
  *            transform(slice(v, j+1, size(v)−j), (xk, k0) =>
  *              struct(j+1, j+1+k0, xj*xk)))))
  *
  * which evaluates INTERPRETED (HOFs are CodegenFallback) with ~d²/2
  * lambda dispatches and d intermediate arrays per row — measured as
  * s20's dominant task CPU at sf0.1 (guide §4). Same doubles (the
  * product is the identical IEEE multiply), same entry order, and NULL
  * elements poison exactly the entries they touch (struct field p is
  * null where xⱼ or xₖ is null, matching the lambda arithmetic). A NULL
  * vector returns null (concat of a null transform) — explode then
  * yields no rows either way.
  */
case class MomentPairs(vec: Expression)
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = vec
  override def prettyName: String = "graft_moment_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("j", IntegerType, nullable = false),
      StructField("k", IntegerType, nullable = false),
      StructField("p", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(vAny: Any): Any = {
    val ad = vAny.asInstanceOf[ArrayData]
    val d = ad.numElements()
    val xs = new Array[Double](d)
    val isNull = new Array[Boolean](d)
    var i = 0
    while (i < d) {
      if (ad.isNullAt(i)) isNull(i) = true else xs(i) = ad.getDouble(i)
      i += 1
    }
    val out = new Array[Any](d + d * (d + 1) / 2)
    var o = 0
    i = 0
    while (i < d) { // first moments (j, 0, xj)
      out(o) = new GenericInternalRow(Array[Any](i + 1, 0,
        if (isNull(i)) null else xs(i)))
      o += 1
      i += 1
    }
    var j = 0
    while (j < d) { // upper triangle (j, k, xj*xk), k >= j
      var k = j
      while (k < d) {
        out(o) = new GenericInternalRow(Array[Any](j + 1, k + 1,
          if (isNull(j) || isNull(k)) null else xs(j) * xs(k)))
        o += 1
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MomentPairs =
    copy(vec = newChild)
}
