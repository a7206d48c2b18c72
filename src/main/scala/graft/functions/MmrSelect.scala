package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_mmr(cands, sims, k) — the greedy maximal-marginal-relevance
  * selection over ONE query's candidate list, as a single expression:
  * `cands` is array<struct<c_id bigint, rel double>> (the query's depth
  * candidates with their relevance), `sims` is
  * array<struct<a_id bigint, b_id bigint, sim double>> (the pairwise
  * candidate-candidate cosines), `k` a literal step count. Returns
  * array<struct<c_id bigint, step int, score double>> — the picks in
  * step order.
  *
  * This is the per-GROUP form of the k-round DataFrame loop it replaces
  * (Similarity.mmrTopK r14 body): each greedy round there was a
  * left-anti + inner join + max-aggregate + row_number window over the
  * WHOLE candidate table, i.e. 4·(k−1) shuffles of data that is
  * per-query bounded (depth ≤ 20 candidates, depth² sims). Grouping by
  * query first and running the greedy loop inside the row turns the
  * whole selection into ONE shuffle (the groupBy) at any scale — the
  * guide §2/§8 "decide on the small grouped state" shape.
  *
  * Exact loop-semantics parity (the DuckDB oracle re-derives every
  * step):
  *  - step 1: argmax rel, ties to the lowest c_id;
  *    score = floor((0.7·rel)·1e6)/1e6 (Prep.floorTo's double chain).
  *  - step j: candidates not yet picked AND having ≥1 sim row against a
  *    picked candidate (the inner-join semantics — a candidate with no
  *    sims is unrankable and skipped); penalty ms = max sim against the
  *    picked set (java.lang.Double.compare, Spark's max ordering);
  *    score = floor(((0.7·rel) − (0.3·ms))·1e6)/1e6; argmax score,
  *    ties to the lowest c_id. No eligible candidate ⇒ selection stops.
  *  - NULL handling: null structs / null rel / null sim rows are
  *    ignored (collect_list never emits null entries; a null rel would
  *    sort last in the window it replaces).
  *
  * Ordering independence: argmax and max use total tie-broken orders, so
  * the result does not depend on collect_list's partition-dependent
  * array order — the property that makes the grouped form hash-stable.
  */
case class MmrSelect(cands: Expression, sims: Expression, kExpr: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = cands
  override def second: Expression = sims
  override def third: Expression = kExpr

  override def prettyName: String = "graft_mmr"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c_id", LongType),
      StructField("step", IntegerType, nullable = false),
      StructField("score", DoubleType))),
    containsNull = false)

  override def nullable: Boolean = cands.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal k")
    (cands.dataType, sims.dataType) match {
      case (ArrayType(StructType(cf), _), ArrayType(StructType(sf), _))
          if cf.length == 2 && cf(0).dataType == LongType &&
            cf(1).dataType == DoubleType &&
            sf.length == 3 && sf(0).dataType == LongType &&
            sf(1).dataType == LongType && sf(2).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<struct<bigint,double>>, " +
            s"array<struct<bigint,bigint,double>>, int), got " +
            s"(${c.catalogString}, ${s.catalogString})")
    }
  }

  @transient private lazy val k: Int =
    kExpr.eval().asInstanceOf[Number].intValue

  private def floorTo6(x: Double): Double =
    math.floor(x * 1.0e6) / 1.0e6

  override def eval(input: InternalRow): Any = {
    val cAny = cands.eval(input)
    if (cAny == null) return null
    val ca = cAny.asInstanceOf[ArrayData]
    val n = ca.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    var nc = 0
    var i = 0
    while (i < n) {
      if (!ca.isNullAt(i)) {
        val r = ca.getStruct(i, 2)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          ids(nc) = r.getLong(0); rels(nc) = r.getDouble(1); nc += 1
        }
      }
      i += 1
    }
    // sims flattened to parallel arrays (depth² rows per query, bounded)
    val sAny = sims.eval(input)
    val (sa, sb, sv, ns) = if (sAny == null) {
      (new Array[Long](0), new Array[Long](0), new Array[Double](0), 0)
    } else {
      val ad = sAny.asInstanceOf[ArrayData]
      val m = ad.numElements()
      val a = new Array[Long](m); val b = new Array[Long](m)
      val v = new Array[Double](m)
      var cnt = 0
      var j = 0
      while (j < m) {
        if (!ad.isNullAt(j)) {
          val r = ad.getStruct(j, 3)
          if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
            a(cnt) = r.getLong(0); b(cnt) = r.getLong(1); v(cnt) = r.getDouble(2)
            cnt += 1
          }
        }
        j += 1
      }
      (a, b, v, cnt)
    }

    val picked = new Array[Boolean](nc)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](k)
    var step = 1
    var done = nc == 0
    // step 1 ranks by RAW rel (the loop's w1 window orders by rel, the
    // floored score is computed after the pick) — ordering by the floored
    // score instead could flip a pick where flooring collapses two
    // distinct rels; steps ≥2 rank by the floored score (the loop's wj).
    if (!done) {
      var bestIdx = -1
      var c = 0
      while (c < nc) {
        if (bestIdx < 0 ||
            java.lang.Double.compare(rels(c), rels(bestIdx)) > 0 ||
            (java.lang.Double.compare(rels(c), rels(bestIdx)) == 0 &&
              ids(c) < ids(bestIdx))) bestIdx = c
        c += 1
      }
      picked(bestIdx) = true
      out += new GenericInternalRow(
        Array[Any](ids(bestIdx), 1, floorTo6(0.7 * rels(bestIdx))))
      step = 2
      if (step > k) done = true
    }
    while (!done && step <= k) {
      var bestIdx = -1
      var bestScore = 0.0
      var c = 0
      while (c < nc) {
        if (!picked(c)) {
          val score: java.lang.Double = {
              // max sim against the picked set; candidate skipped when it
              // has no sim row to any picked (the inner-join semantics)
              var ms = Double.NaN
              var any = false
              var s = 0
              while (s < ns) {
                if (sa(s) == ids(c)) {
                  var p = 0
                  var isPicked = false
                  while (p < nc && !isPicked) {
                    if (picked(p) && ids(p) == sb(s)) isPicked = true
                    p += 1
                  }
                  if (isPicked &&
                      (!any || java.lang.Double.compare(sv(s), ms) > 0)) {
                    ms = sv(s); any = true
                  }
                }
                s += 1
              }
              if (any) floorTo6((0.7 * rels(c)) - (0.3 * ms)) else null
          }
          if (score != null) {
            val sc = score.doubleValue()
            if (bestIdx < 0 ||
                java.lang.Double.compare(sc, bestScore) > 0 ||
                (java.lang.Double.compare(sc, bestScore) == 0 &&
                  ids(c) < ids(bestIdx))) {
              bestIdx = c; bestScore = sc
            }
          }
        }
        c += 1
      }
      if (bestIdx < 0) done = true
      else {
        picked(bestIdx) = true
        out += new GenericInternalRow(
          Array[Any](ids(bestIdx), step, bestScore))
        step += 1
        if (step > k) done = true
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MmrSelect =
    copy(cands = newFirst, sims = newSecond, kExpr = newThird)
}
