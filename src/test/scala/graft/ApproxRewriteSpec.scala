package graft

import org.apache.spark.sql.functions._
import graft.core.GraftConf
import graft.plans.ApproxDistinctRewrite

/** The conf-gated count(DISTINCT) → HLL++ optimizer rewrite
  * (graft.plans.ApproxDistinctRewrite), exercised through the runtime
  * install path GraftConf.ensure uses on driver-handed sessions.
  */
class ApproxRewriteSpec extends SparkSpec {

  private def optimizedPlanOf(sess: org.apache.spark.sql.SparkSession) = {
    // Tables.events handles the TIMESTAMP(NANOS) normalization this
    // fresh session would otherwise reject.
    val df = graft.core.Tables.events(sess, sf)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("u"))
    (df, df.queryExecution.optimizedPlan.toString)
  }

  test("disabled (default): plan keeps exact distinct count") {
    val sess = spark.newSession()
    GraftConf.ensure(sess)
    val (_, plan) = optimizedPlanOf(sess)
    assert(!plan.contains("approx_count_distinct"), plan)
    assert(plan.toLowerCase.contains("distinct"), plan)
  }

  test("enabled: plan rewrites to HLL++ and counts stay within 5% of exact") {
    val sess = spark.newSession()
    GraftConf.ensure(sess)
    sess.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    val (df, plan) = optimizedPlanOf(sess)
    assert(plan.contains("approx_count_distinct"), plan)

    val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sess.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    val exact = optimizedPlanOf(sess)._1.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("install is idempotent (no duplicate rule registrations)") {
    val sess = spark.newSession()
    ApproxDistinctRewrite.install(sess)
    ApproxDistinctRewrite.install(sess)
    assert(sess.experimental.extraOptimizations
      .count(_ eq ApproxDistinctRewrite) == 1)
  }
}
