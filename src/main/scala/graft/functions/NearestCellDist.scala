package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_nearest_cell_dist(v, ids, matrix) — [[NearestCell]]'s twin that
  * returns the WINNING squared distance instead of the winning cell id:
  * the map-only form of "distance to the nearest codeword", which is what
  * the PQ distortion audits aggregate (PQ.distortionBySubspace). Same
  * argmin kernel, same float chain (d2 = (dot(v,v) − 2.0·dot(v,c)) +
  * dot(c,c), left-to-right folds), same (d2, cell-id-ascending) tie-break
  * — so the returned d2 equals min(struct(d2, cell)).d2 of the broadcast-
  * join formulation bit-for-bit. Null semantics identical to NearestCell.
  */
case class NearestCellDist(vec: Expression, idsLit: Expression, matLit: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = idsLit
  override def third: Expression = matLit

  override def prettyName: String = "graft_nearest_cell_dist"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!idsLit.foldable || !matLit.foldable)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable (literal) ids and matrix arguments")
    (vec.dataType, idsLit.dataType, matLit.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, i, m) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<int>, array<array<double>>), " +
            s"got (${v.catalogString}, ${i.catalogString}, ${m.catalogString})")
    }
  }

  @transient private lazy val mat: Array[Array[Double]] = {
    val ad = matLit.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  // dot(c,c) per centroid, same left-to-right fold as the join form
  @transient private lazy val cc: Array[Double] = mat.map { c =>
    var a = 0.0; var i = 0
    while (i < c.length) { a += c(i) * c(i); i += 1 }
    a
  }

  private def bestD2(v: Array[Double]): java.lang.Double = {
    // dot(v,v) is centroid-independent: hoisted out of the j loop (same
    // left-to-right fold ⇒ same double every iteration, bit parity kept)
    var dvv = 0.0
    var h = 0
    while (h < v.length) { dvv += v(h) * v(h); h += 1 }
    var best = Double.NaN
    var first = true
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      if (c.length != v.length) return null
      var dvc = 0.0
      var i = 0
      while (i < v.length) {
        dvc += v(i) * c(i)
        i += 1
      }
      val d2 = (dvv - 2.0 * dvc) + cc(j)
      if (first || java.lang.Double.compare(d2, best) < 0) {
        best = d2; first = false
      }
      j += 1
    }
    best
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return null
    val vd = vAny.asInstanceOf[ArrayData]
    val n = vd.numElements()
    var i = 0
    while (i < n) {
      if (vd.isNullAt(i)) return null
      i += 1
    }
    if (mat.isEmpty) return null
    bestD2(vd.toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val matRef = ctx.addReferenceObj("cents", mat, "double[][]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
    val vCode = vec.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val i2 = ctx.freshName("i2")
    val j = ctx.freshName("j")
    val dvv = ctx.freshName("dvv")
    val dvc = ctx.freshName("dvc")
    val d2 = ctx.freshName("d2")
    val best = ctx.freshName("best")
    val firstF = ctx.freshName("first")
    val c = ctx.freshName("c")
    val vArr = ctx.freshName("vArr")
    val hasNull = ctx.freshName("hasNull")
    val lenBad = ctx.freshName("lenBad")
    ev.copy(code =
      code"""
        |${vCode.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${vCode.isNull} && $matRef.length > 0) {
        |  int $n = ${vCode.value}.numElements();
        |  boolean $hasNull = false;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if (${vCode.value}.isNullAt($i)) { $hasNull = true; break; }
        |  }
        |  if (!$hasNull) {
        |    double[] $vArr = ${vCode.value}.toDoubleArray();
        |    // dot(v,v) is centroid-independent — hoisted (same fold, same double)
        |    double $dvv = 0.0;
        |    for (int $i2 = 0; $i2 < $n; $i2++) {
        |      $dvv += $vArr[$i2] * $vArr[$i2];
        |    }
        |    double $best = 0.0; boolean $firstF = true;
        |    boolean $lenBad = false;
        |    for (int $j = 0; $j < $matRef.length; $j++) {
        |      double[] $c = $matRef[$j];
        |      if ($c.length != $n) { $lenBad = true; break; }
        |      double $dvc = 0.0;
        |      for (int $i2 = 0; $i2 < $n; $i2++) {
        |        $dvc += $vArr[$i2] * $c[$i2];
        |      }
        |      double $d2 = ($dvv - 2.0 * $dvc) + $ccRef[$j];
        |      if ($firstF || java.lang.Double.compare($d2, $best) < 0) {
        |        $best = $d2; $firstF = false;
        |      }
        |    }
        |    if (!$lenBad) { ${ev.isNull} = false; ${ev.value} = $best; }
        |  }
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCellDist =
    copy(vec = newFirst, idsLit = newSecond, matLit = newThird)
}
