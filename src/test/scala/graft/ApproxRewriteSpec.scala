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

  test("percentile rewrite: double child swaps to sketch within 2% rank error; int child keeps exact") {
    val sess = spark.newSession()
    GraftConf.ensure(sess)
    import graft.plans.ApproxPercentileRewrite
    def median(c: String) = {
      val df = graft.core.Tables.events(sess, sf)
        .groupBy("event_type")
        .agg(expr(s"percentile($c, 0.5)").as("p50"))
      (df, df.queryExecution.optimizedPlan.toString)
    }
    // default off: exact percentile survives
    assert(!median("value")._2.contains("percentile_approx"))
    sess.conf.set(ApproxPercentileRewrite.ConfKey, "true")
    val (apDf, apPlan) = median("value")
    assert(apPlan.contains("percentile_approx"), apPlan)
    // the sketch's p50 must sit within the exact p45-p55 band per group
    sess.conf.set(ApproxPercentileRewrite.ConfKey, "false")
    val bands = graft.core.Tables.events(sess, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.45)").as("lo"),
        expr("percentile(value, 0.55)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    apDf.collect().foreach { r =>
      val (lo, hi) = bands(r.getString(0))
      val v = r.getDouble(1)
      assert(v >= lo && v <= hi, s"${r.getString(0)}: sketch p50 $v outside [$lo,$hi]")
    }
    // integral child: type-changing rewrite must NOT fire
    sess.conf.set(ApproxPercentileRewrite.ConfKey, "true")
    val intPlan = graft.core.Tables.events(sess, sf)
      .groupBy("event_type")
      .agg(expr("percentile(user_id, 0.5)").as("p50"))
      .queryExecution.optimizedPlan.toString
    assert(!intPlan.contains("percentile_approx"), intPlan)
  }
}
