package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random noise + extreme-value injection + z-score
  * override — the reference's synthetic fact logic, generalized
  * (reference jobs/03_silver_to_gold.py:92-128).
  *
  * Semantic sharp edges preserved (SURVEY.md §2.4 F7/F8):
  *  - `hash(...)` is Spark's Murmur3-32 with seed 42 — bit-identical across
  *    PySpark and Scala, so outputs reproduce the reference exactly;
  *  - `%` keeps the dividend's sign (Spark/Java semantics, NOT pmod), so
  *    `hash % 100 / 50.0` spans (−2, 2) including negatives;
  *  - injection branch ORDER matters: the `% 25` branch shadows `% 27`
  *    when both divide (when/when/otherwise chain).
  *
  * All expressions are built-in and codegen'd; at scale these are free
  * map-side column ops with no shuffle.
  */
object Anomaly {

  /** Signed deterministic noise in (−100/scale, 100/scale), keyed on
    * `keys` via Murmur3 (reference 03:97).
    */
  def deterministicNoise(keys: Seq[Column], scale: Double = 50.0,
                         out: String = "local_noise")(df: DataFrame): DataFrame =
    df.withColumn(out, (hash(keys: _*) % 100) / scale)

  /** Overwrite noise with ±`magnitude` on deterministic key-hash buckets:
    * `abs(hash) % hiMod == 0` → +magnitude, else `abs(hash) % loMod == 0`
    * → −magnitude (reference 03:101-105; branch order load-bearing).
    */
  def injectExtremes(keys: Seq[Column], noiseCol: String = "local_noise",
                     magnitude: Double = 15.0, hiMod: Int = 25, loMod: Int = 27)(
      df: DataFrame): DataFrame = {
    val h = abs(hash(keys: _*))
    df.withColumn(noiseCol,
      when(h % hiMod === 0, lit(magnitude))
        .when(h % loMod === 0, lit(-magnitude))
        .otherwise(col(noiseCol)))
  }

  /** Hard z-score override for injected rows: noise beyond ±`noiseThreshold`
    * pins z to ±`zValue` (reference 03:124-128).
    */
  def overrideInjectedZ(noiseCol: String = "local_noise", zCol: String = "z_score",
                        noiseThreshold: Double = 10.0, zValue: Double = 5.0)(
      df: DataFrame): DataFrame =
    df.withColumn(zCol,
      when(col(noiseCol) > noiseThreshold, lit(zValue))
        .when(col(noiseCol) < -noiseThreshold, lit(-zValue))
        .otherwise(col(zCol)))
}
