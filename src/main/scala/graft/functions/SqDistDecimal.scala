package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_sqdist_dec(v, matrix) — DECIMAL-EXACT squared distances to every
  * centroid row: array<double> where entry j =
  * `cast(sum(cast((vᵢ − cⱼᵢ)² as decimal(38,18))) as double)`, the exact
  * arithmetic of the label-centroid audits (s21 confusion matrix, s24
  * silhouette). This is the map-only spelling of their exploded form —
  * (vec × dim) rows joined to the (label × dim) centroid table and
  * re-aggregated per (vec, label): n·d·L joined rows with a per-row
  * double→DECIMAL(38,18) cast and a decimal-sum shuffle (measured as the
  * queries' dominant cost at sf0.1: 1.28M decimal rows each). The kernel
  * pays the identical per-term rounding (Spark's own
  * `Decimal(double).changePrecision(38, 18)` — HALF_UP at scale 18 on
  * the DECIMAL128 construction, byte-for-byte the Cast path) and an
  * exact java.math.BigDecimal accumulation (decimal addition is exact —
  * the same order-independence the aggregate relies on), then
  * `.doubleValue` = Decimal.toDouble. SimilaritySpec pins bit parity
  * against the exploded chain.
  *
  * Null semantics replicate the join form: a null ELEMENT's terms are
  * skipped in every centroid's sum (sum ignores nulls); a vector with NO
  * non-null terms against a centroid yields a null entry (sum of
  * nothing). A null vector returns null (the caller's explode drops the
  * row, as posexplode over the null transform did). Terms exist only for
  * dims present in BOTH arrays (the inner join on dim).
  */
case class SqDistDecimal(vec: Expression, matLit: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = matLit
  override def prettyName: String = "graft_sqdist_dec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!matLit.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) centroid matrix")
    (vec.dataType, matLit.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, m) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<array<double>>), got " +
          s"(${v.catalogString}, ${m.catalogString})")
    }
  }

  @transient private lazy val mat: Array[Array[Double]] = {
    val ad = matLit.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(vAny: Any, matAny: Any): Any = {
    val ad = vAny.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val xs = new Array[Double](n)
    val isNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i)) isNull(i) = true else xs(i) = ad.getDouble(i)
      i += 1
    }
    val out = new Array[Any](mat.length)
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val lim = math.min(n, c.length)
      var acc = java.math.BigDecimal.ZERO
      var any = false
      var k = 0
      while (k < lim) {
        if (!isNull(k)) {
          val diff = xs(k) - c(k)
          val sq = diff * diff
          // Spark's Cast(double -> decimal(38,18)) pipeline, verbatim
          val d = org.apache.spark.sql.types.Decimal(sq)
          d.changePrecision(38, 18)
          acc = acc.add(d.toJavaBigDecimal)
          any = true
        }
        k += 1
      }
      out(j) = if (any) acc.doubleValue else null
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDecimal =
    copy(vec = newLeft, matLit = newRight)
}
