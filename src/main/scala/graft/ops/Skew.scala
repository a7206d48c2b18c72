package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting. A hot join key concentrates one
  * shuffle partition; salting splits each left-side key into `salts`
  * sub-keys and replicates the right side once per salt, so the hot key's
  * rows spread over `salts` tasks. Semantics identical to the plain join
  * (every left row meets every matching right row exactly once — each
  * left row carries ONE salt, and the right side exists for EVERY salt).
  *
  * AQE's skew-join splitting handles sort-merge skew automatically at
  * runtime; explicit salting remains the tool when AQE can't help
  * (pre-aggregations keyed on the hot key, or replicating a
  * broadcast-ineligible dimension).
  */
object Skew {

  /** Inner equi-join on `key` with the left side salted into `salts`
    * buckets and the right side replicated per salt. `right` must be the
    * smaller side (it is replicated ×salts).
    *
    * The salt is a DETERMINISTIC hash of the whole left row, never a
    * nondeterministic expression (mid/rand): a nondeterministic value
    * feeding a shuffle key re-rolls on task retry, landing recomputed
    * rows in different reducers than their already-fetched copies —
    * duplicated/lost rows under fetch failure (the rand()-partitioning
    * hazard). Trade-off: fully identical duplicate rows share a salt and
    * don't spread — run exact dedup first if that's your skew.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)).cast("int"))
    val saltValues = right.sparkSession.range(salts)
      .select(col("id").cast("int").as("__salt"))
    val replicated = right.crossJoin(broadcast(saltValues))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
