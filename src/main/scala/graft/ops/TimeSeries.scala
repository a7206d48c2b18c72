package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators beyond the reference's daily/monthly aggregates
  * (SURVEY.md §1.1 "Time series" row): calendar-spine gap filling with
  * forward fill, and a banded interval join. Both are declarative
  * `DataFrame => DataFrame` shapes that survive 100 TB:
  *
  *  - gap filling builds the date spine with `sequence()`+`explode` per
  *    key group (distributed generation — no driver-side calendar loop,
  *    no collect); the spine join is a broadcast-able left join when the
  *    key set is small, a co-partitioned shuffle join otherwise.
  *  - the interval join buckets time into fixed bins and equi-joins on
  *    (key, bin) with each probe row exploded to the two candidate bins
  *    covering its window — Catalyst gets a hash join instead of the
  *    O(n·m) broadcast-nested-loop a raw range predicate would plan.
  *    This is the standard banding trick Flink/KDB interval joins use.
  */
object TimeSeries {

  /** Per-key daily calendar spine over the GLOBAL [min,max] day range of
    * `df`: one row per (key, day) even where `df` has no rows that day.
    * The spine is keys × sequence(minDay, maxDay) — generated
    * distributively; the 1-row bounds aggregate broadcasts.
    */
  def dailySpine(df: DataFrame, key: Column, day: Column): DataFrame = {
    val bounds = df.agg(min(day).as("lo"), max(day).as("hi"))
    val keys = df.select(key.as("k")).distinct()
    keys.crossJoin(broadcast(bounds))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
  }

  /** Forward fill: replace nulls in `c` with the most recent non-null
    * value within the key partition in `order` order (standard `ffill`).
    * One window exchange on the key.
    */
  def forwardFill(c: Column, partition: Seq[Column], order: Column): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partition: _*).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Banded interval join: for each probe row, count/aggregate build rows
    * of the same key whose timestamp falls in [probe.ts − window, probe.ts].
    *
    * Probe rows are exploded to the two `window`-sized bins their lookback
    * window can span; build rows carry their own bin; the join is then a
    * pure equi-join on (key, bin) + an exact range filter. A build row
    * matches at most one exploded copy of a given probe row (its bin
    * equals exactly one of the two), so no dedup/double-count pass is
    * needed. Left semantics: probes with zero matches survive with n = 0.
    *
    * Returns (p_id, n_matches) — one row per probe id; join back on
    * `p_id` to recover other probe columns.
    */
  def countInWindow(probe: DataFrame, probeKey: Column, probeTs: Column,
                    probeId: Column, build: DataFrame, buildKey: Column,
                    buildTs: Column, windowSec: Long): DataFrame =
    bandedMatches(probe, probeKey, probeTs, probeId,
        build, buildKey, buildTs, Nil, windowSec)
      .groupBy(col("p_id"))
      .agg(count(col("b_ts")).as("n_matches"))

  /** Point-in-time feature snapshot: per probe row, count AND exact
    * decimal sum of a build-side value over the same banded lookback
    * window — the leakage-safe feature-backfill join a training pipeline
    * runs to attach "user's activity in the window BEFORE the label
    * event" features. Zero-match probes survive with (0, 0.0).
    */
  def aggInWindow(probe: DataFrame, probeKey: Column, probeTs: Column,
                  probeId: Column, build: DataFrame, buildKey: Column,
                  buildTs: Column, buildVal: Column, windowSec: Long): DataFrame =
    bandedMatches(probe, probeKey, probeTs, probeId,
        build, buildKey, buildTs, Seq(buildVal.as("b_val")), windowSec)
      .groupBy(col("p_id"))
      .agg(count(col("b_ts")).as("n_matches"),
        coalesce(graft.core.Exact.decimalSumExpr(col("b_val")), lit(0.0))
          .as("sum_value"))

  /** Truncated exponential smoothing over a keyed daily series: for each
    * (key, day) the weighted mean of the trailing `lookback` days' values
    * with weights decay^(day − day'), renormalized over the days actually
    * present (gaps simply drop out of both numerator and denominator).
    * Truncation bounds the error at decay^lookback (< 1e-4 at 0.7^21) and
    * — decisively — turns the sequential EWMA recurrence into a BANDED
    * SELF-JOIN: each row pairs with ≤ lookback+1 partners via the same
    * two-bin explode trick as [[countInWindow]] (a build row's bin equals
    * exactly one of the probe row's two candidate bins, so the join is
    * pure equi on (key, bin) — never a range-predicate nested loop, and
    * never a per-key sequential scan). At 100 TB this shuffles on
    * (key, bin) with constant fan-out per row.
    *
    * Weighted terms go through DECIMAL(28,10) before summing so the
    * per-day sums are order-independent (exact decimal addition — the
    * same cross-engine parity discipline as Exact.decimalSum).
    *
    * Input: (key, ed, x) with `ed` an epoch-day-like integer and `x` the
    * day's value. Returns (key, ed, x, ewma).
    */
  def ewmaSmooth(daily: DataFrame, key: String, ed: String, x: String,
                 decay: Double, lookback: Int): DataFrame = {
    val span = lookback + 1 // bin width covers the full window
    val p = daily.select(col(key).as("k"), col(ed).as("p_ed"), col(x).as("p_x"))
      .withColumn("bin0", expr(s"p_ed div $span"))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"))))
      .drop("bin0")
    val b = daily.select(col(key).as("k"), col(ed).as("b_ed"), col(x).as("b_x"))
      .withColumn("bin", expr(s"b_ed div $span"))
    val w = pow(lit(decay), col("p_ed") - col("b_ed"))
    p.join(b, Seq("k", "bin"))
      .filter(col("b_ed") >= col("p_ed") - lit(lookback) &&
        col("b_ed") <= col("p_ed"))
      .groupBy(col("k").as(key), col("p_ed").as(ed), col("p_x").as(x))
      .agg(
        sum((col("b_x") * w).cast("decimal(28,10)")).as("__num"),
        sum(w.cast("decimal(28,10)")).as("__den"))
      .withColumn("ewma",
        col("__num").cast("double") / col("__den").cast("double"))
      .drop("__num", "__den")
  }

  /** Single change-point detection per series (the binary-segmentation
    * step; equivalent to the CUSUM-statistic argmax for a mean shift):
    * for each candidate split after ordered index k, the between-segment
    * sum of squares Δ(k) = (n·Sₖ − k·S)² / (k·(n−k)·n) — maximizing it
    * picks the split that best explains the series as two level segments.
    *
    * The prefix-sum identity makes every Δ(k) O(1) from one ordered
    * running-sum window — O(n) total instead of the O(n²) "recompute
    * both segment means per split" form. All algebra up to the final
    * division is exact integer (counts → prefix sums), so the argmax
    * compares identical correctly-rounded doubles in any engine; ties
    * break to the earliest split.
    *
    * Input: one row per (key, day, cnt) — a pre-aggregated series.
    * Returns (key, change_day, score, mean_before, mean_after), one row
    * per key (raw doubles; callers round for display/oracle parity).
    */
  def changepoint(daily: DataFrame, key: String, day: String,
                  cnt: String): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(day)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val p = daily
      .withColumn("__k", row_number().over(wOrd))
      .withColumn("__sk", sum(col(cnt)).over(wRun))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__st", sum(col(cnt)).over(wAll))
      .filter(col("__k") < col("__n"))
    val num = col("__n") * col("__sk") - col("__k") * col("__st")
    val wArg = Window.partitionBy(key).orderBy(col("__score").desc, col(day))
    p.withColumn("__score", (num * num).cast("double") /
        (col("__k") * (col("__n") - col("__k")) * col("__n")).cast("double"))
      .withColumn("__rn", row_number().over(wArg))
      .filter(col("__rn") === 1)
      .select(col(key), col(day).as("change_day"), col("__score").as("score"),
        (col("__sk").cast("double") / col("__k")).as("mean_before"),
        ((col("__st") - col("__sk")).cast("double") /
          (col("__n") - col("__k"))).as("mean_after"))
  }

  /** The shared banding core: one row per (probe, matching build row),
    * left semantics (zero-match probes keep one row with NULL b_ts).
    * Probe rows are exploded to the two `window`-sized bins their
    * lookback can span; build rows carry their own bin; the join is a
    * pure equi-join on (key, bin) + exact range filter. A build row
    * matches at most one exploded copy of a probe row, so no dedup pass.
    * `buildVals` are carried through for downstream aggregation.
    */
  private def bandedMatches(probe: DataFrame, probeKey: Column, probeTs: Column,
                            probeId: Column, build: DataFrame, buildKey: Column,
                            buildTs: Column, buildVals: Seq[Column],
                            windowSec: Long): DataFrame = {
    // integer `div` on micros — double division loses precision at 1.7e18
    val binUs = windowSec * 1000000L
    val p = probe.select(probeId.as("p_id"), probeKey.as("k"), probeTs.as("p_ts"))
      .withColumn("bin0", expr(s"unix_micros(p_ts) div $binUs"))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"))))
      .drop("bin0")
    val b = build.select((buildKey.as("k") +: buildTs.as("b_ts") +: buildVals): _*)
      .withColumn("bin", expr(s"unix_micros(b_ts) div $binUs"))
    p.join(b,
      p("k") === b("k") && p("bin") === b("bin") &&
        col("b_ts") >= col("p_ts") - expr(s"interval $windowSec second") &&
        col("b_ts") <= col("p_ts"),
      "left")
  }
}
