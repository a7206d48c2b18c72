package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Unit tests for Stats on hand-built rows — the semantic sharp edges
  * called out in SURVEY.md §5: sample stddev, zero-stddev guard, NULL
  * stddev on single-row partitions, moving-average frames.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("zscore: standardizes within partition with sample stddev") {
    // partition a: values 2, 4, 6 → avg 4, stddev_samp 2 → z = -1, 0, 1
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0)).toDF("k", "v")
    val z = Stats.zscore(col("v"), Seq(col("k")))(df)
      .orderBy("v").select("z_score").as[Double].collect()
    assert(z.toSeq == Seq(-1.0, 0.0, 1.0))
  }

  test("zscore: stddev == 0 guard yields 0.0, not NaN") {
    val df = Seq(("a", 5.0), ("a", 5.0)).toDF("k", "v")
    val z = Stats.zscore(col("v"), Seq(col("k")))(df)
      .select("z_score").as[Double].collect()
    assert(z.toSeq == Seq(0.0, 0.0))
  }

  test("zscore: single-row partition gives NULL z (sample stddev of n=1)") {
    val df = Seq(("a", 5.0)).toDF("k", "v")
    val z = Stats.zscore(col("v"), Seq(col("k")))(df)
      .select(col("z_score").isNull).as[Boolean].collect()
    assert(z.toSeq == Seq(true))
  }

  test("movingAvg: trailing n-row frame with leading partials") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("t", "v")
    val m = Stats.movingAvg(col("v"), Seq(col("t")), n = 2)(df)
      .orderBy("t").select("moving_avg").as[Double].collect()
    assert(m.toSeq == Seq(1.0, 1.5, 2.5, 3.5))
  }

  test("extremes: threshold filter + HIGH/LOW labels") {
    val df = Seq((1, 3.0), (2, -2.6), (3, 0.5)).toDF("id", "z")
    val got = Stats.extremes(col("z"))(df)
      .orderBy("id").select("id", "event_type")
      .as[(Int, String)].collect()
    assert(got.toSeq == Seq((1, "EXTREME_HIGH"), (2, "EXTREME_LOW")))
  }

  test("kpis: avg/max/min/stddev/count with rounding") {
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0)).toDF("g", "v")
    val row = Stats.kpis(col("v"), Seq(col("g")))(df).collect().head
    assert(row.getDouble(1) == 2.0)    // avg
    assert(row.getDouble(2) == 3.0)    // max
    assert(row.getDouble(3) == 1.0)    // min
    assert(row.getDouble(4) == 1.0)    // stddev_samp of 1,2,3
    assert(row.getLong(5) == 3L)       // count
  }

  test("nullProfile: counts nulls per column") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (None, None))
      .toDF("a", "b")
    val row = Stats.nullProfile(df).collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 1L)
  }

  test("q59 HLL merge: daily-sketch union within 5% of exact, == one-shot sketch") {
    val ev = graft.core.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("x"))
      .as[(String, Long)].collect().toMap
    val merged = SparkEntry.queries("q59_hll_merge")(spark, sf)
      .select("event_type", "est_users").as[(String, Long)].collect().toMap
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (t, est) =>
      val err = math.abs(est.toDouble - exact(t)) / exact(t)
      assert(err <= 0.05, f"$t: HLL estimate $est vs exact ${exact(t)} (err $err%.3f)")
      // partition-then-union must agree with the single-pass sketch — the
      // mergeability contract the incremental pattern relies on
      assert(est == oneShot(t), s"$t: merged $est != one-shot ${oneShot(t)}")
    }
  }
  test("olsFit: exact line y = 2x + 1 recovered exactly, per group") {
    import spark.implicits._
    import graft.ops.Stats
    val df = Seq(("g", 0L, 1.0), ("g", 1L, 3.0), ("g", 2L, 5.0),
      ("h", 0L, 10.0), ("h", 2L, 10.0)).toDF("k", "x", "y")
    val got = Stats.olsFit(df, Seq("k"), col("x"), col("y"))
      .orderBy("k").select("k", "slope", "intercept")
      .as[(String, Double, Double)].collect().toSeq
    // moments are exact (integral x, decimal-summed y), so the closed
    // form hits the true coefficients with zero error
    assert(got == Seq(("g", 2.0, 1.0), ("h", 0.0, 10.0)), s"got $got")
  }

  test("mannWhitneyU: textbook tie case — average ranks, U1+U2 = na*nb") {
    import spark.implicits._
    import graft.ops.Stats
    // A = {1,3,3}, B = {2,3,5}: the three 3s share rank (3+4+5)/3 = 4
    // R1 = 1 + 4 + 4 = 9, U1 = 9 - 6 = 3, U2 = 9 - 3 = 6
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 5.0), ("c", 99.0)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, col("g") === "a", col("g") === "b", col("v"))
      .select("n_a", "n_b", "u1", "u2", "z")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r._1 == 3 && r._2 == 3, s"counts $r")
    assert(r._3 == 3.0 && r._4 == 6.0, s"U $r")
    assert(math.abs(r._5 - (-1.5 / math.sqrt(3.0 * 3 * 7 / 12))) < 1e-12, s"z $r")
  }
}
