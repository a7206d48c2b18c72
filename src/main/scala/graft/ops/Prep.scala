package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-preparation operators for ML/training-data pipelines:
  * per-group scaling, robust (median/MAD) statistics, and deterministic
  * hash sampling. All are one-or-two-aggregate shapes whose shuffle
  * volume is O(groups), with the per-group statistics broadcast back
  * onto the fact rows — the only pattern that survives 100 TB facts.
  */
object Prep {

  /** Per-group min/max statistics joined back onto every row as
    * `__mn`/`__mx`. min/max are order-independent, so the scaled values
    * are bit-reproducible across engines (unlike mean/stddev scaling,
    * whose double sums are accumulation-order-dependent — see
    * [[graft.core.Exact.decimalSum]] for that fix).
    */
  def withMinMax(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    df.join(broadcast(stats), keys)
  }

  /** Min-max scaled value in [0,1]; constant groups scale to 0.0.
    * Single-division shape `(x - mn) / (mx - mn)` for IEEE parity.
    */
  def minMaxScaled(x: Column): Column =
    when(col("__mx") === col("__mn"), lit(0.0))
      .otherwise((x - col("__mn")) / (col("__mx") - col("__mn")))

  /** Per-group exact median computed as "average of the middle one/two
    * row_number'd values". Built-in `percentile`/`median` interpolate with
    * engine-specific expression shapes (`a + 0.5*(b-a)` vs `(a+b)/2`) that
    * can differ in the last ulp; this form forces the same `(a+b)/2` in
    * every engine. One window + one tiny agg; the window partitions by the
    * group key, so it scales like any keyed window (no global sort).
    */
  def groupedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                    alias: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wc = Window.partitionBy(keys.map(col): _*)
    df.select(keys.map(col) :+ col(valueCol): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .filter(col("__rn") === floor((col("__cnt") + 1) / 2) ||
              col("__rn") === floor((col("__cnt") + 2) / 2))
      .groupBy(keys.map(col): _*)
      .agg(avg(col(valueCol)).as(alias))
  }

  /** The matching DuckDB SQL for [[groupedMedian]] (same rows, same
    * `(a+b)/2`): generated here so Spark and oracle can't drift.
    * `table`/`key`/`value` are SQL fragments; emits a SELECT yielding
    * (key, alias).
    */
  def groupedMedianSql(table: String, key: String, value: String,
                       alias: String): String =
    s"""SELECT $key, avg($value) AS $alias FROM (
       |  SELECT $key, $value,
       |    row_number() OVER (PARTITION BY $key ORDER BY $value) AS rn,
       |    count(*)    OVER (PARTITION BY $key) AS cnt
       |  FROM $table)
       |WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
       |GROUP BY $key""".stripMargin

  /** Engine-portable fixed-decimal truncation: floor(x·10^d)/10^d.
    * Use this — not `round(x, d)` — when a DOUBLE computed identically in
    * both engines is the output column: round() implementations diverge
    * at representability boundaries (Spark rounds the exact binary
    * expansion via BigDecimal, DuckDB rounds a decimal shortening, so a
    * value a few ulps under .xxxx5 can round down in one and up in the
    * other — q65 hit exactly this at sf0.1). floor has no tie semantics:
    * identical doubles in, identical doubles out. Existing round() sites
    * pass the full 3-SF sweep and are left as-is; NEW rounded-double
    * display columns should prefer this. SQL twin: [[floorToSql]].
    */
  def floorTo(x: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(x * lit(p)) / lit(p)
  }

  /** DuckDB SQL form of [[floorTo]] (CAST keeps the scale factor DOUBLE —
    * a bare literal would be DECIMAL and change the arithmetic). */
  def floorToSql(x: String, digits: Int): String = {
    val p = math.pow(10.0, digits).toLong
    s"floor(($x) * CAST($p AS DOUBLE)) / CAST($p AS DOUBLE)"
  }

  /** Deterministic multiplicative hash in [0, 2^32) from two integer
    * columns — a portable stand-in for `rand()` that any engine computes
    * identically (Knuth multiplicative constants; products stay below
    * 2^63 for ids up to ~10^9). Used for reservoir-style fixed-size
    * samples: rank by hash within the group, keep k.
    */
  def portableHash(a: Column, b: Column): Column =
    (a * lit(2654435761L) + b * lit(40503L)) % lit(4294967296L)

  /** SQL form of [[portableHash]]. */
  def portableHashSql(a: String, b: String): String =
    s"(($a * 2654435761 + $b * 40503) % 4294967296)"

  /** Scale-safe exact global row_number — the bucketed prefix-sum rank.
    *
    * `row_number() OVER (ORDER BY value, tieBreak)` moves every row into
    * ONE window task (WindowExec has no partial mode under an empty
    * partitionSpec): a single-task sort of the whole input — the scale
    * killer behind the q110/q125/q128 audit items. This form produces
    * the IDENTICAL rank with no unpartitioned window anywhere:
    *
    *   1. approx_percentile edges (one tree-reduced aggregate; B−1
    *      doubles collected to the driver) quantize `value` into ≤B
    *      buckets. The edges are re-embedded as a LITERAL array so the
    *      bucket function is bit-identical in every later pass — a
    *      re-evaluated sketch could legally place a row differently
    *      between the histogram job and the final plan.
    *   2. per-bucket counts (map-side-combinable aggregate, ≤B result
    *      rows) are prefix-summed ON THE DRIVER into a B-entry
    *      bucket→prior-count literal map — the IVF/PQ k-row-collect
    *      discipline, never a data-sized pull.
    *   3. rank = prior(bucket) + row_number() within the bucket — a
    *      PARTITIONED window: ~B concurrent sorts of ~n/B rows each.
    *
    * Exact, not approximate: the sketch only picks PARTITION BOUNDARIES.
    * The bucket function is monotone in `value` (count of edges strictly
    * below) and value-ties always land in one bucket, so
    * prior + local rank == the global row_number for ANY edge placement;
    * sketch error skews bucket sizes, never rank values.
    *
    * `value` must be non-null and castable to double (the cast feeds
    * only the bucket assignment — ordering uses the original column, so
    * exact types rank exactly). NaN is handled: it buckets explicitly
    * into the TOP bucket (Spark's sort order puts NaN above every real
    * double, so `value > edge` — false for NaN — would otherwise drop
    * NaN rows into bucket 0 while the window sorts them last, breaking
    * the rank permutation). The rank lands as LONG (the global
    * window's INT rank overflows past 2³¹ rows anyway). Cost: two extra
    * narrow passes over the input (edge sketch + bucket histogram) — the
    * price of deleting the single-task sort. Raise `buckets` toward the
    * cluster's target parallelism at larger scales (exactness holds for
    * ANY B — GraftProps drives B=7 against heavy ties); the default 64
    * matches the local harness.
    */
  /** Auto tie-split task budget (see `autoSplitBudget` below): the
    * largest in-bucket window cell [[rankViaBuckets]] accepts before
    * switching to pair edges. A cell is ONE window task — one executor
    * thread sorting it, one task's memory holding it — so the budget is
    * the task envelope, not a fixture knob: ~16 M (value, tie, payload)
    * rows ≈ 1-2 GB, the spill edge of a default-sized executor.
    * Measured calibration (SCALE.md q145): at sf10 the biggest tie cell
    * is ~3 M rows, a ~4 s single-task sort — far below budget, so the
    * switch stays OFF exactly where it was measured to cost 46 s vs
    * 11-13 s; it fires only when a cell outgrows a task, which is when
    * the single-task sort (and its spill) dwarfs the pair-edge overhead.
    */
  val SplitTiesTaskBudget: Long = 16000000L

  def rankViaBuckets(df: DataFrame, value: Column, tieBreak: Column,
                     ascending: Boolean = true, buckets: Int = 64,
                     rankCol: String = "rank",
                     partitionKeys: Seq[Column] = Nil,
                     splitTies: Boolean = false,
                     autoSplitBudget: Long = 0L): DataFrame = {
    // --- bucket function -------------------------------------------------
    // Default: percentile edges on `value` alone, ties-in-one-bucket (the
    // exactness argument needs only monotonicity). splitTies=true swaps in
    // PAIR edges on (value, tieBreak) for tie-HEAVY values — q145's Gini
    // rank runs over per-key counts with ~7 distinct values, which
    // collapses 64 value-buckets to 7 and hands the in-bucket window a
    // multi-million-row single task (measured 74.7 s of q145's 100 s at
    // sf10). Pair edges come from a deterministic hash-ordered sample
    // (TakeOrdered — a bounded 50k-row driver pull), and the bucket
    // function counts edges strictly below the row under the SAME
    // (value, tie) composite order the rank uses, so monotonicity — and
    // with it prior+local == global — holds exactly as before; exact
    // (value, tie) duplicates still land in one bucket. REQUIREMENTS for
    // splitTies: `value` must cast to double INJECTIVELY over its
    // distinct values (integral values below 2^53 — counts qualify; a
    // collision between distinct values could otherwise invert the pair
    // comparison) and `tieBreak` must be non-null and cast to double
    // MONOTONICALLY (collisions fine — they're ties at bucket level).
    // Both bucket functions are CODEGEN'D COMPARISON CHAINS (nested
    // CASE WHEN over the ≤B−1 literal edges), not filter()-HOF counts:
    // ArrayFilter is eval-mode — 63 boxed lambda evaluations per row,
    // paid TWICE (the bucket-histogram pass and the final plan), measured
    // as the dominant term of q145's 100 s sf10 noop time. The chain
    // finds the first edge the row does not pass — identical bucket ids,
    // native comparisons inside whole-stage codegen.
    // `autoSplitBudget > 0` arms the DERIVED activation: the value-edge
    // histogram (computed below for the priors anyway) reveals the
    // largest cell; if it exceeds the budget, the pair-edge function is
    // built and the histogram recomputed — the code, not a doc, decides
    // when tie-splitting pays. Ranks are IDENTICAL under either bucket
    // function (the exactness argument is bucket-function-independent),
    // so the switch can never change a hash — only the physical
    // partitioning. Activation is gated on the caller arming it because
    // the pair form has TYPE requirements (injective value cast,
    // monotone non-null tieBreak cast) the generic rank cannot assume.
    def pairBucket(): Column = {
        val vd = value.cast("double"); val td = tieBreak.cast("double")
        // hash NATIVE column types — casting to string first was measured
        // at 13.8-56.9 s vs 1.0-1.6 s for the same TakeOrdered at sf10
        val sample = df
          .select(vd.as("v"), td.as("t"))
          .orderBy(xxhash64(value, tieBreak))
          .limit(50000).collect()
          .map(r => (r.getDouble(0), r.getDouble(1)))
        // Bucket ids follow the EXISTING convention (increasing with
        // ascending value; prior accumulation flips direction for desc):
        //  - asc: bucket = |{e : e ≺ row}| under (v asc, t asc) —
        //    monotone NON-DECREASING along the rank order; edges sorted
        //    ascending, so {e ≺ row} is a PREFIX and the first
        //    non-preceding edge's index IS the count;
        //  - desc: bucket = |{e : row ≺ e}| under (v desc, t asc) —
        //    monotone NON-INCREASING along the rank order (matching the
        //    sortBy(-bucket) prior direction below); edges sorted in rank
        //    order, {row ≺ e} is a SUFFIX, count = B − first index.
        val ordered =
          if (ascending) sample.sortBy(identity)
          else sample.sortBy { case (v, t) => (-v, t) }
        val edges =
          if (ordered.isEmpty) Seq.empty
          else (1 until buckets)
            .map(i => ordered(math.min((i.toLong * ordered.length / buckets).toInt,
              ordered.length - 1))).distinct
        if (edges.isEmpty) lit(0)
        else if (ascending)
          // NaN value: every comparison is false → falls through to the
          // top bucket, exactly the explicit NaN pin (it sorts last)
          edges.zipWithIndex.foldRight(lit(edges.size): Column) {
            case (((ev, et), i), acc) =>
              when(vd < lit(ev) || (vd === lit(ev) && td <= lit(et)), lit(i))
                .otherwise(acc)
          }
        else
          // NaN sorts FIRST under desc (Spark: NaN greatest) — pin it to
          // the top bucket explicitly, whose prior is 0 in desc order
          when(isnan(vd), lit(edges.size)).otherwise(
            edges.zipWithIndex.foldRight(lit(0): Column) {
              case (((ev, et), i), acc) =>
                when(vd > lit(ev) || (vd === lit(ev) && td < lit(et)),
                  lit(edges.size - i)).otherwise(acc)
            })
    }
    def valueBucket(): Column = {
        val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
        val edgeRow = df.agg(percentile_approx(value.cast("double"),
          array(qs: _*), lit(10000)).as("e")).head()
        // empty input → no edges → everything in bucket 0, prior map empty
        val edgeVals: Seq[Double] =
          if (edgeRow.isNullAt(0)) Seq.empty else edgeRow.getSeq[Double](0)
        // NaN sorts ABOVE every real double in Spark's ordering and
        // compares false against every edge, so it falls through the
        // chain to the TOP bucket — exactly where the global window puts
        // it (first under desc priors, last under asc), preserving the
        // explicit NaN pin of the pre-chain formulation.
        val vd = value.cast("double")
        if (edgeVals.isEmpty) lit(0)
        else edgeVals.zipWithIndex.foldRight(lit(edgeVals.size): Column) {
          case ((e, i), acc) => when(vd <= lit(e), lit(i)).otherwise(acc)
        }
    }
    val bucketOf: Column = if (splitTies) pairBucket() else valueBucket()
    val ord =
      if (ascending) Seq(value.asc, tieBreak.asc)
      else Seq(value.desc, tieBreak.asc)
    if (partitionKeys.isEmpty) {
      var withB = df.withColumn("__rvb_b", bucketOf)
      var counts = withB.groupBy(col("__rvb_b"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toSeq
      if (!splitTies && autoSplitBudget > 0 && counts.nonEmpty &&
          counts.map(_._2).max > autoSplitBudget) {
        // a cell outgrew a task: pay the pair-edge sample + one extra
        // histogram pass to break the tie class across buckets
        withB = df.withColumn("__rvb_b", pairBucket())
        counts = withB.groupBy(col("__rvb_b"))
          .agg(count(lit(1)).as("c")).collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toSeq
      }
      val ordered = if (ascending) counts.sortBy(_._1) else counts.sortBy(-_._1)
      val priors: Map[Int, Long] =
        ordered.map(_._1).zip(ordered.scanLeft(0L)(_ + _._2).init).toMap
      val w = Window.partitionBy(col("__rvb_b")).orderBy(ord: _*)
      withB.withColumn(rankCol,
          coalesce(element_at(typedLit(priors), col("__rvb_b")), lit(0L)) +
            row_number().over(w))
        .drop("__rvb_b")
    } else {
      // PER-GROUP rank for LOW-cardinality partition keys — the skewed
      // case a plain keyed window can't survive: `partitionBy(segment)`
      // with 5 segments is a 5-task sort of the table, the same
      // single-task problem divided by five. Sketch edges stay GLOBAL
      // (they only place partition boundaries); priors become a
      // (group, bucket)-keyed driver map; the window partitions by
      // (keys…, bucket). Keys must render stably as strings (string /
      // integer columns) and group-cardinality × buckets must stay
      // driver-small — guarded below, the k-row-collect discipline.
      //
      // Key encoding is a netstring per component (`V<len>:<chars>`,
      // null -> `N0:`): a bare concat_ws SKIPS nulls, so a null-key
      // group and an empty-string group (or keys containing the
      // separator) would collide to one prior-map key while the window
      // still partitions them apart — silently wrong ranks for both.
      // The length prefix makes the concatenation prefix-free, so
      // distinct key tuples can never render to the same string.
      def encKey(k: Column): Column = {
        val ks = k.cast("string")
        concat(
          when(ks.isNull, lit("N0:"))
            .otherwise(concat(lit("V"), length(ks).cast("string"), lit(":"))),
          coalesce(ks, lit("")))
      }
      val pkStr = concat(partitionKeys.map(encKey): _*)
      var withB = df.withColumn("__rvb_b", bucketOf)
        .withColumn("__rvb_p", pkStr)
      // limit(guard+1) BOUNDS the driver pull before the cardinality
      // check: a runaway key domain fails the require() after pulling
      // 100 001 rows, instead of OOMing the driver it should protect.
      def cellCounts() = withB.groupBy(col("__rvb_p"), col("__rvb_b"))
        .agg(count(lit(1)).as("c")).limit(100001).collect()
      var counts = cellCounts()
      if (!splitTies && autoSplitBudget > 0 && counts.nonEmpty &&
          counts.map(_.getLong(2)).max > autoSplitBudget) {
        withB = df.withColumn("__rvb_b", pairBucket())
          .withColumn("__rvb_p", pkStr)
        counts = cellCounts()
      }
      require(counts.length <= 100000,
        s"rankViaBuckets(partitionKeys): ${counts.length} (group, bucket) " +
          "cells — partition keys must be low-cardinality (use a plain " +
          "keyed window, or raise the guard, for wide key domains)")
      val priors: Map[String, Long] = counts
        .groupBy(_.getString(0))
        .flatMap { case (p, rows) =>
          val cells = rows.map(r => r.getInt(1) -> r.getLong(2)).toSeq
          val orderedCells =
            if (ascending) cells.sortBy(_._1) else cells.sortBy(-_._1)
          orderedCells.map(_._1)
            .zip(orderedCells.scanLeft(0L)(_ + _._2).init)
            .map { case (b, prior) => s"$p\u0001$b" -> prior }
        }
      val w = Window.partitionBy(partitionKeys :+ col("__rvb_b"): _*)
        .orderBy(ord: _*)
      withB.withColumn(rankCol,
          coalesce(element_at(typedLit(priors),
            concat_ws("\u0001", col("__rvb_p"), col("__rvb_b").cast("string"))),
            lit(0L)) + row_number().over(w))
        .drop("__rvb_b", "__rvb_p")
    }
  }

  /** [[rankViaBuckets]]'s sibling for CUMULATIVE SUMS: exact running
    * totals of integer weight columns over a VALUE-KEYED table (one row
    * per distinct value), without the unpartitioned
    * `sum(w) OVER (ORDER BY value)` window. "Distinct values" is NOT a
    * bounded grain for continuous columns (events.value at sf0.1:
    * ~18% of rows are distinct) — a CDF/rank-sum window over it is the
    * same single-task sort q110/q125/q128 had, one aggregation earlier.
    *
    * Same three moves as rankViaBuckets: literal sketch edges pick
    * bucket boundaries; per-bucket WEIGHT TOTALS (≤B rows) prefix-sum on
    * the driver into per-weight prior maps; the in-bucket running sum is
    * a PARTITIONED window. prior(bucket) + running == the global running
    * total exactly (counts are longs — no float reassociation), for any
    * edge placement. `inclusive=false` gives the strict-prior frame
    * (rows BEFORE current — Mann-Whitney's tie base) instead of the CDF
    * frame.
    *
    * `value` must be non-null with one row per value; weights must be
    * integral (LONG) columns. Appends one output column per entry of
    * `weights` (inputCol -> outputCol).
    */
  def runningTotalsViaBuckets(df: DataFrame, value: Column,
                              weights: Seq[(String, String)],
                              inclusive: Boolean = true,
                              buckets: Int = 64): DataFrame = {
    val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val edgeRow = df.agg(percentile_approx(value.cast("double"),
      array(qs: _*), lit(10000)).as("e")).head()
    val edgeVals: Seq[Double] =
      if (edgeRow.isNullAt(0)) Seq.empty else edgeRow.getSeq[Double](0)
    // NaN pins to the top bucket for the same reason as rankViaBuckets:
    // `vd > e` is false for NaN but Spark sorts NaN above every real.
    val bucketOf =
      if (edgeVals.isEmpty) lit(0)
      else when(isnan(value.cast("double")), lit(edgeVals.size))
        .otherwise(size(filter(array(edgeVals.map(lit): _*),
          e => value.cast("double") > e)))
    val withB = df.withColumn("__rtb_b", bucketOf)
    val wAggs = weights.map { case (in, _) => sum(col(in)).as(in) }
    val totals = withB.groupBy(col("__rtb_b"))
      .agg(wAggs.head, wAggs.tail: _*)
      .collect()
    val bucketsSorted = totals.map(_.getInt(0)).sorted
    val priorMaps: Seq[Map[Int, Long]] = weights.indices.map { wi =>
      val totByBucket = totals.map(r => r.getInt(0) -> r.getLong(wi + 1)).toMap
      val priors = bucketsSorted.scanLeft(0L)((acc, b) => acc + totByBucket(b))
      bucketsSorted.zip(priors.init).toMap
    }
    val frameEnd = if (inclusive) 0L else -1L
    val w = Window.partitionBy(col("__rtb_b")).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    weights.zipWithIndex.foldLeft(withB) {
      case (acc, ((in, out), wi)) =>
        acc.withColumn(out,
          coalesce(element_at(typedLit(priorMaps(wi)), col("__rtb_b")), lit(0L)) +
            coalesce(sum(col(in)).over(w), lit(0L)))
    }.drop("__rtb_b")
  }

  /** Weighted-sampling key (the A-ES / exponential-race scheme from the
    * weighted-reservoir literature): key = −ln(u)/w with u a
    * [[portableHash]]-derived uniform in (0, 1]; ranking ASCENDING keeps
    * each item with probability ∝ its weight — the quality-weighted
    * corpus-sampling primitive (sample docs ∝ quality score without ever
    * materializing normalized probabilities, mergeable across partitions
    * because the key is per-row). Deterministic: the uniform comes from
    * the hash, never rand() — reproducible across runs, engines, AND
    * task retries (a rand() sampling key re-rolls on retry; see
    * Skew.saltedJoin's scaladoc for why that corrupts results).
    * Consumers rank by (round(key, 6), id): the rounding collapses
    * sub-ulp libm ln() differences across engines, the id breaks ties.
    */
  def weightedSampleKey(w: Column, a: Column, b: Column): Column =
    -log((portableHash(a, b) + lit(1.0)) / lit(4294967297.0)) / w

  /** SQL form of [[weightedSampleKey]]. */
  def weightedSampleKeySql(w: String, a: String, b: String): String =
    s"(-ln((${portableHashSql(a, b)} + 1.0) / 4294967297.0) / $w)"
}
