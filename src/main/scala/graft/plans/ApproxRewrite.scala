package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query-processing rewrite: when
  * `spark.graft.approx.countDistinct=true`, every exact
  * `count(DISTINCT x)` in the plan becomes a HyperLogLog++ sketch count
  * (`approx_count_distinct`, default 5% relative error).
  *
  * Why a Catalyst rule rather than "just call approx_count_distinct":
  * at 100 TB an exact distinct count is a full shuffle of every distinct
  * value (the expensive thing on the cluster), while the sketch is a
  * fixed few-KB buffer per group merged map-side — but the people
  * writing ad-hoc SQL or reusing saved queries shouldn't have to know
  * that. Flipping one session conf converts a whole dashboard's worth of
  * plans without touching query text, and flipping it back restores
  * exact semantics. The rewrite only fires on aggregates still carrying
  * `isDistinct = true` when the rule runs; multi-distinct aggregates that
  * Catalyst's RewriteDistinctAggregates has already expanded keep their
  * exact Expand-based plan.
  *
  * Two installation paths, same object:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (build-time
  *    session config) — see [[graft.functions.GraftExtensions]];
  *  - [[ApproxDistinctRewrite.install]] — runtime, used by
  *    [[graft.core.GraftConf.ensure]] so driver-handed sessions get it.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approx.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(c.children.head),
              isDistinct = false)
        }
    }

  /** Idempotent runtime installation on an arbitrary session (the rule
    * itself is inert until the conf key is set to true).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    }
}

/** Second conf-gated AQP rewrite: when
  * `spark.graft.approx.percentile=true`, every exact `percentile(x, p)`
  * becomes `approx_percentile(x, p)` (KLL-style mergeable sketch,
  * default accuracy).
  *
  * Same 100 TB rationale as the HLL rule: exact percentile materializes
  * per-group sorted value buffers (`OpenHashMap` of every distinct value
  * + count — memory proportional to group cardinality), while the
  * approximate sketch is a bounded buffer merged map-side; this is the
  * q44 → q45 swap applied to a whole workload by flipping one conf.
  *
  * The rewrite is deliberately narrower than it could be:
  *  - only `frequency = 1` percentiles (the plain form) rewrite — the
  *    weighted form has no approximate counterpart;
  *  - only DOUBLE-typed children rewrite, because exact percentile
  *    INTERPOLATES (always double) while the sketch returns an observed
  *    value of the child's type — for double inputs the types match and
  *    downstream resolved expressions stay valid; for integral inputs a
  *    rewrite would change the result type mid-plan (and quietly drop
  *    interpolation), so those keep their exact plan.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
  import org.apache.spark.sql.types.DoubleType

  val ConfKey = "spark.graft.approx.percentile"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if p.child.dataType == DoubleType &&
                p.frequencyExpression == Literal(1L) =>
            ae.copy(aggregateFunction = ApproximatePercentile(
              p.child, p.percentageExpression,
              Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY),
              0, 0))
        }
    }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxPercentileRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxPercentileRewrite
    }
}
