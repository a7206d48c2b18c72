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
