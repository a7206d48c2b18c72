package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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
    * The salt is a DETERMINISTIC hash, never a nondeterministic
    * expression (mid/rand): a nondeterministic value feeding a shuffle
    * key re-rolls on task retry, landing recomputed rows in different
    * reducers than their already-fetched copies — duplicated/lost rows
    * under fetch failure (the rand()-partitioning hazard).
    *
    * `saltBy` names the row-discriminator columns hashed WITH the key to
    * spread a hot key's rows (a primary key / line id is ideal: cheap and
    * unique). When empty, the salt falls back to hashing every hashable
    * left column — correct, but it pays to hash wide text payloads and it
    * must skip map-typed columns entirely (Spark's hash() rejects MapType
    * at analysis, since map element order is undefined). Trade-off either
    * way: rows identical across all salt inputs share a salt and don't
    * spread — run exact dedup first if that's your skew.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, saltBy: Seq[String] = Seq.empty): DataFrame = {
    val saltCols =
      if (saltBy.nonEmpty) (key +: saltBy).map(col)
      else left.schema.fields.collect {
        case f if !containsMap(f.dataType) => col(f.name)
      }.toSeq
    require(saltCols.nonEmpty,
      "saltedJoin: no hashable columns to salt by — pass saltBy explicitly")
    val salted = left.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(salts)).cast("int"))
    val saltValues = right.sparkSession.range(salts)
      .select(col("id").cast("int").as("__salt"))
    val replicated = right.crossJoin(broadcast(saltValues))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** True when a type is (or nests) a MapType — unhashable by hash(). */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType          => true
    case a: ArrayType        => containsMap(a.elementType)
    case s: StructType       => s.fields.exists(f => containsMap(f.dataType))
    case _                   => false
  }
}
