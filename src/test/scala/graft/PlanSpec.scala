package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Plan-shape regression tests: the scale properties SCALE.md claims,
  * asserted against the actual physical plans so a refactor that silently
  * adds a shuffle or un-pushes a filter fails CI.
  */
class PlanSpec extends SparkSpec {

  // AQE wraps plans in AdaptiveSparkPlanExec (children hidden until
  // execution), so count shuffle exchanges on the rendered plan.
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("q01 grouped aggregate: exactly one shuffle (partial+final agg)") {
    // final orderBy adds a range-partition exchange; the aggregate itself
    // must contribute exactly one
    val agg = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"))
    assert(shuffles(agg) == 1, agg.queryExecution.executedPlan.toString)
  }

  test("q04 zscore window: exactly one shuffle, both window aggs share it") {
    val z = graft.ops.Stats.zscore(col("value"), Seq(col("user_id")))(
      Tables.events(spark, sf))
    assert(shuffles(z) == 1, z.queryExecution.executedPlan.toString)
  }

  test("star join: dimension sides broadcast, no shuffle on lineitem path") {
    val q = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.nation(spark, sf)).withColumnRenamed("n_nationkey", "l_suppkey"),
        Seq("l_suppkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(shuffles(q) == 0, plan)
  }

  test("filter + projection are pushed into the parquet scan") {
    val q = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity,45.0)"), scan)
    // ReadSchema restricted to the needed columns
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("minhash signature is map-only: zero shuffles") {
    val sig = graft.ext.Dedup.minhashSignature(
      Tables.documents(spark, sf), col("doc_id"), col("text"))
    assert(shuffles(sig) == 0, sig.queryExecution.executedPlan.toString)
  }

  test("banded interval join plans as a hash/sort-merge join, never BNLJ") {
    val ev = Tables.events(spark, sf)
    val q = graft.ops.TimeSeries.countInWindow(
      ev.filter(col("event_type") === "error"),
      col("user_id"), col("ts"), col("event_id"),
      ev.filter(col("event_type") === "click"),
      col("user_id"), col("ts"), windowSec = 300L)
    val plan = q.queryExecution.executedPlan.toString
    // the whole point of banding: the range predicate rides an equi-join
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q29 as-of join is join-free: union + one keyed window, no inflation") {
    // The naive formulation joins events×orders on (key, range) and rank-
    // filters — O(events × orders-per-user) intermediate. The union-spine
    // form must plan with NO join operator at all: one hash exchange for
    // the per-key window plus the final presentation sort.
    val q = SparkEntry.queries("q29_asof_join")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Union"), plan)
    assert(shuffles(q) == 2, plan)
  }

  test("q45 approx equi-depth: no window operator, edges broadcast back") {
    // q44's exact form needs a global-order ntile window (single task);
    // the scale form must plan with NO window at all — sketch aggregate,
    // broadcast, map-side bucket assign, one final aggregate.
    val q = SparkEntry.queries("q45_equidepth_approx")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val q = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(shuffles(q) == 0, plan)
  }
}
