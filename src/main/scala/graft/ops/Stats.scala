package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical transforms generalized from the reference's signature
  * computations (reference jobs/03_silver_to_gold.py:33-43, 113-128).
  *
  * All transforms are pure `DataFrame => DataFrame` and stay inside
  * Catalyst built-in expressions (whole-stage codegen'd, no UDFs) —
  * the reference itself is 100% built-in-expression-based (SURVEY.md §2.9),
  * and at 100 TB that is what keeps every one of these inside
  * WholeStageCodegen with partial aggregation pushed map-side.
  */
object Stats {

  /** Per-partition z-score standardization: z = (x − avg(x)) / stddev(x)
    * over `partitionBy`, with the reference's `stddev == 0 → 0.0` guard
    * (reference jobs/03_silver_to_gold.py:113-121).
    *
    * Semantics preserved exactly:
    *  - `stddev` is SAMPLE stddev (n−1), Spark's default (SURVEY.md §2.7 W1);
    *  - a single-row partition yields stddev NULL, and the zero-guard does
    *    NOT catch NULL → z_score is NULL (SURVEY.md §7.5 risk 3).
    *
    * Scale: one Exchange on the partition keys; both window aggregates share
    * the same WindowExec pass (no extra shuffle for the second aggregate).
    * At 1000 executors this is a single hash-partitioned shuffle on the
    * partition key — skew in a hot key is the only hazard; callers with
    * known-skewed keys should pre-aggregate or salt.
    */
  def zscore(value: Column, partitionBy: Seq[Column], out: String = "z_score")(
      df: DataFrame): DataFrame = {
    val w   = Window.partitionBy(partitionBy: _*)
    val avgC = avg(value).over(w)
    val stdC = stddev(value).over(w)
    df.withColumn(out,
      when(stdC === 0.0, 0.0).otherwise((value - avgC) / stdC))
  }

  /** Skew-safe z-score: identical semantics to [[zscore]] but computed as
    * a grouped aggregate (map-side combined) joined back to the rows,
    * instead of a window. A window moves EVERY row of a partition key into
    * one task — a hot key (one user with 10⁹ events) serializes; this
    * formulation shuffles only the per-key (avg, stddev) pairs and
    * re-joins (broadcast when the key cardinality is small). Use this at
    * scale whenever key skew is possible. Results match [[zscore]] up to
    * floating-point aggregation order: the hash aggregate merges
    * per-partition partials in arbitrary order while the window folds
    * sequentially, so avg/stddev can differ in the last ulps when a key
    * spans partitions — q31's oracle rounds z to 4 decimals, which
    * absorbs this; don't claim raw-double equality across the two forms.
    */
  def zscoreViaAgg(value: Column, partitionBy: Seq[Column], out: String = "z_score")(
      df: DataFrame): DataFrame = {
    // alias each key and join null-safely (<=>): a window groups NULL keys
    // together, so a plain inner join (NULL != NULL) would silently drop
    // those rows; aliasing also permits computed key expressions
    val aliases = partitionBy.indices.map(i => s"__k$i")
    val stats = df.groupBy(partitionBy.zip(aliases).map { case (c, a) => c.as(a) }: _*)
      .agg(avg(value).as("__avg"), stddev(value).as("__std"))
    val cond = aliases.zip(partitionBy)
      .map { case (a, c) => col(a) <=> c }.reduce(_ && _)
    df.join(stats, cond)
      .withColumn(out,
        when(col("__std") === 0.0, 0.0).otherwise((value - col("__avg")) / col("__std")))
      .drop(aliases :+ "__avg" :+ "__std": _*)
  }

  /** Trailing n-period moving average over `order` within optional
    * partitions — the notebook's 12-month rolling mean (SURVEY.md §2.7 W2).
    * Frame is ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW; leading partial
    * windows are emitted (callers can filter on `count` if pandas-style
    * nulls for the first n−1 rows are needed).
    */
  def movingAvg(value: Column, order: Seq[Column], n: Int,
                partitionBy: Seq[Column] = Nil, out: String = "moving_avg")(
      df: DataFrame): DataFrame = {
    val w0 = if (partitionBy.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    val w = w0.rowsBetween(-(n - 1), Window.currentRow)
    df.withColumn(out, avg(value).over(w))
  }

  /** Grouped KPI aggregate — the reference's climate_kpis shape
    * (reference jobs/03_silver_to_gold.py:33-43): avg/max/min/stddev of a
    * measure, each rounded to `dp` decimals, plus row count. Partial+final
    * HashAggregate; a single shuffle on the group keys, map-side combined,
    * so it scales linearly with input and never materializes groups driver-side.
    */
  def kpis(measure: Column, groupBy: Seq[Column], dp: Int = 4)(
      df: DataFrame): DataFrame =
    df.groupBy(groupBy: _*).agg(
      round(avg(measure), dp).as("avg_value"),
      round(max(measure), dp).as("max_value"),
      round(min(measure), dp).as("min_value"),
      round(stddev(measure), dp).as("std_dev_value"),
      count(lit(1)).as("record_count"))

  /** Extreme-event classification over a standardized column — the
    * reference's climate_extremes (reference jobs/03_silver_to_gold.py:148-152):
    * keep |z| >= threshold, label positive side `highLabel` else `lowLabel`.
    * Narrow (filter+project only): no shuffle, fully pushed into the scan
    * when `z` is a stored column.
    */
  def extremes(z: Column, threshold: Double = 2.5,
               highLabel: String = "EXTREME_HIGH", lowLabel: String = "EXTREME_LOW",
               out: String = "event_type")(df: DataFrame): DataFrame =
    df.filter(abs(z) >= threshold)
      .withColumn(out, when(z > 0, highLabel).otherwise(lowLabel))

  /** Per-column null count — the notebook's data-quality profile
    * (SURVEY.md §2.6 A6). Single global aggregate, one reduce.
    */
  def nullProfile(df: DataFrame): DataFrame =
    // df(c), not col(c): exact-name resolution — a column literally named
    // "user.name" would otherwise parse as struct-field access and throw
    df.select(df.columns.toSeq.map(c =>
      sum(df(c).isNull.cast("long")).as(c)): _*)

  /** Per-group closed-form simple linear regression (least squares of
    * `y` on `x`): one aggregate computes the four moments — Σx and Σx²
    * stay integral (callers pass a small integer-valued x like a day
    * offset), Σy and Σxy go through DECIMAL(28,10) so they're exact and
    * accumulation-order-independent — then slope/intercept are a fixed
    * chain of IEEE doubles any engine evaluates identically from
    * identical inputs. One shuffle on the group keys, map-side combined;
    * no window, no second pass over the fact.
    *
    * Returns the group keys + (n, slope, intercept) with slope/intercept
    * raw doubles (callers round/floor for display).
    */
  def olsFit(df: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    val m = df.select(keys.map(col) :+ x.as("__x") :+ y.as("__y"): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y").cast("decimal(28,10)")).cast("double").as("__sy"),
        sum((col("__x").cast("double") * col("__y")).cast("decimal(28,10)"))
          .cast("double").as("__sxy"))
    val nD = col("n").cast("double")
    val sxD = col("__sx").cast("double")
    val slope = (nD * col("__sxy") - sxD * col("__sy")) /
      (nD * col("__sxx").cast("double") - sxD * sxD)
    m.withColumn("slope", slope)
      .withColumn("intercept", (col("__sy") - col("slope") * sxD) / nD)
      .drop("__sx", "__sxx", "__sy", "__sxy")
  }

  /** Mann-Whitney U (Wilcoxon rank-sum): the nonparametric two-sample
    * location test. Rows where `isA` hold are sample A, `isB` sample B
    * (others ignored). The fact reduces to per-value counts FIRST, so the
    * ranking window runs over distinct values, not rows; tied values get
    * the textbook average rank derived exactly from the prior cumulative
    * count. Every rank is a multiple of ½ and every sum below stays well
    * under 2⁵³, so the arithmetic is exact in doubles — order-independent
    * with no decimal detour. Returns one row: (n_a, n_b, u1, u2, z) with
    * z the normal approximation WITHOUT tie correction (raw double;
    * callers round for display).
    *
    * "Distinct values" is NOT a bounded grain for continuous columns
    * (~18% of event values are distinct at sf0.1), so the tie-base prior
    * counts come from [[Prep.runningTotalsViaBuckets]] — the bucketed
    * prefix-sum (exact longs, identical __prior values) — never an
    * unpartitioned window, at any cardinality.
    */
  def mannWhitneyU(df: DataFrame, isA: Column, isB: Column,
                   value: Column): DataFrame = {
    val c = df.filter(isA || isB)
      .groupBy(value.as("__v"))
      .agg(count(when(isA, 1)).as("__ca"), count(when(isB, 1)).as("__cb"))
    val n = c.agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    val r = Prep.runningTotalsViaBuckets(
        c.withColumn("__w", col("__ca") + col("__cb")),
        col("__v"), Seq("__w" -> "__prior"), inclusive = false)
      .agg(sum(col("__ca") *
        (col("__prior") + (col("__ca") + col("__cb") + 1) / lit(2.0))).as("__r1"))
    val naD = col("n_a").cast("double")
    r.crossJoin(broadcast(n))
      .withColumn("u1", col("__r1") - col("n_a") * (col("n_a") + 1) / lit(2.0))
      .withColumn("u2", naD * col("n_b") - col("u1"))
      .withColumn("z", (col("u1") - naD * col("n_b") / lit(2.0)) /
        sqrt(naD * col("n_b") * (col("n_a") + col("n_b") + 1) / lit(12.0)))
      .select(col("n_a"), col("n_b"), col("u1"), col("u2"), col("z"))
  }
}
