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
