package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curves).
  *
  * At 100 TB the dominant cost of a selective query is how much of the
  * table the scan can SKIP. Sorting by one column gives perfect skipping
  * on that column and none on any other; interleaving the bits of several
  * quantized columns (a Z-order key) gives good locality on all of them
  * at once, so parquet row-group min/max stats prune multi-dimensional
  * predicates (the idea behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Everything here is pure column arithmetic (codegen'd built-ins —
  * shiftleft/shiftright/and/or), so the key computation itself never
  * shuffles; only the final `repartitionByRange` moves data, which is the
  * point of the operator.
  */
object Layout {

  /** Quantize a numeric column into `[0, 2^bits)` given its min/max.
    * The arithmetic shape `floor(((x - mn) * (2^bits - 1).0) / max(mx - mn, 1))`
    * is chosen to be bit-reproducible in any IEEE-754 engine (one multiply,
    * one divide, one floor — no re-association).
    */
  def quantize(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val levels = ((1L << bits) - 1).toDouble
    floor(((x - mn) * lit(levels)) / greatest(mx - mn, lit(1L))).cast("long")
  }

  /** Morton-interleave two already-quantized `[0, 2^bits)` long columns:
    * bit i of `qx` lands at position 2i+1, bit i of `qy` at 2i. The fold
    * unrolls to a flat OR-tree of shift/mask terms that whole-stage
    * codegen compiles to straight-line long arithmetic.
    */
  def zorderKey(qx: Column, qy: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** The matching DuckDB/ANSI SQL for [[zorderKey]], generated from the
    * same loop so the two can never drift. `qx`/`qy` are SQL expressions.
    */
  def zorderKeySql(qx: String, qy: String, bits: Int = 16): String =
    (0 until bits)
      .map(i => s"((($qx >> $i) & 1) << ${2 * i + 1}) | ((($qy >> $i) & 1) << ${2 * i})")
      .mkString(" | ")

  /** Cluster `df` on the Z-order key of two numeric columns: quantize each
    * dimension against its global min/max (one tiny agg, broadcast back),
    * compute the interleaved key, and range-repartition on it so each
    * output partition holds a contiguous Z-range (→ tight per-file min/max
    * stats on BOTH dimensions). `numPartitions` ≈ target file count.
    */
  def clusterByZorder(df: DataFrame, x: String, y: String,
                      bits: Int = 16, numPartitions: Int = 32): DataFrame = {
    val mm = df.agg(
      min(col(x)).as("__xmin"), max(col(x)).as("__xmax"),
      min(col(y)).as("__ymin"), max(col(y)).as("__ymax"))
    val keyed = df.crossJoin(broadcast(mm))
      .withColumn("__zkey", zorderKey(
        quantize(col(x), col("__xmin"), col("__xmax"), bits),
        quantize(col(y), col("__ymin"), col("__ymax"), bits), bits))
    keyed.repartitionByRange(numPartitions, col("__zkey"))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }
}
