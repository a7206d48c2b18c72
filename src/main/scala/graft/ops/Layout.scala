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

  // ---------- Hilbert curve ----------

  /** Per-level (x, y, d) update formulas of the iterative Hilbert xy→d
    * transform (the standard quadrant-fold: take the top remaining bit of
    * each coordinate, accumulate the quadrant's cell count, then
    * reflect/transpose the frame for the next level). Emitted ONCE as
    * portable ANSI SQL (`CASE`/`&`/integer arithmetic only) and consumed
    * VERBATIM by both engines — the Spark side wraps each string in
    * `expr(...)`, the oracle embeds the same strings in chained CTEs — so
    * the two implementations cannot drift. The quadrant index
    * `(3·rx) XOR ry` is spelled `3·rx + ry·(1 − 2·rx)` (same truth table)
    * to stay inside the dialect intersection (XOR syntax differs).
    * LayoutSpec proves the defining property exhaustively: consecutive
    * keys are always grid-adjacent — which Z-order lacks.
    */
  private def hilbertLevelSql(i: Int, bits: Int): (String, String, String) = {
    val s = 1L << (bits - 1 - i)
    val m = (1L << bits) - 1
    val rx = s"(CASE WHEN (hx$i & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (hy$i & $s) > 0 THEN 1 ELSE 0 END)"
    val newX = s"CASE WHEN (hy$i & $s) > 0 THEN hx$i " +
      s"WHEN (hx$i & $s) > 0 THEN $m - hy$i ELSE hy$i END"
    val newY = s"CASE WHEN (hy$i & $s) > 0 THEN hy$i " +
      s"WHEN (hx$i & $s) > 0 THEN $m - hx$i ELSE hx$i END"
    val newD = s"hd$i + CAST(${s * s} AS BIGINT) * (3 * $rx + $ry * (1 - 2 * $rx))"
    (newX, newY, newD)
  }

  /** Append the Hilbert index of two already-quantized `[0, 2^bits)` long
    * columns as `out`. Unlike [[zorderKey]]'s flat OR-tree, the Hilbert
    * transform threads state (the rotating frame) through its levels, so
    * it materializes one named column triple per level — still a single
    * whole-stage-codegen projection chain, no shuffle.
    */
  def withHilbertKey(df: DataFrame, qx: Column, qy: Column,
                     bits: Int = 8, out: String = "hkey"): DataFrame = {
    val start = df.withColumn("hx0", qx.cast("long"))
      .withColumn("hy0", qy.cast("long"))
      .withColumn("hd0", lit(0L))
    val done = (0 until bits).foldLeft(start) { (cur, i) =>
      val (nx, ny, nd) = hilbertLevelSql(i, bits)
      cur.withColumn(s"hx${i + 1}", expr(nx))
        .withColumn(s"hy${i + 1}", expr(ny))
        .withColumn(s"hd${i + 1}", expr(nd))
    }
    done.withColumn(out, col(s"hd$bits"))
      .drop((0 to bits).flatMap(i => Seq(s"hx$i", s"hy$i", s"hd$i")): _*)
  }

  /** The matching chained-CTE SQL for [[withHilbertKey]], generated from
    * the SAME per-level formulas. `base` must expose `carry` columns plus
    * `qx`/`qy` expressions; the last CTE is `h<bits>` with the key in
    * `hd<bits>`.
    */
  def hilbertCtesSql(base: String, carry: Seq[String],
                     qx: String, qy: String, bits: Int = 8): String = {
    val cols = carry.mkString(", ")
    val first = s"h0 AS (SELECT $cols, CAST($qx AS BIGINT) AS hx0, " +
      s"CAST($qy AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM $base)"
    val levels = (0 until bits).map { i =>
      val (nx, ny, nd) = hilbertLevelSql(i, bits)
      s"h${i + 1} AS (SELECT $cols, $nx AS hx${i + 1}, $ny AS hy${i + 1}, " +
        s"$nd AS hd${i + 1} FROM h$i)"
    }
    (first +: levels).mkString(",\n")
  }

  /** Cluster `df` on the Hilbert key of two numeric columns — same
    * contract as [[clusterByZorder]] but with the strictly better curve:
    * consecutive key ranges are always spatially contiguous (no Z-shape
    * seam jumps), so per-file min/max envelopes are tighter at equal file
    * count. This is the `OPTIMIZE ... HILBERT` layout primitive.
    */
  def clusterByHilbert(df: DataFrame, x: String, y: String,
                       bits: Int = 8, numPartitions: Int = 32): DataFrame = {
    val mm = df.agg(
      min(col(x)).as("__xmin"), max(col(x)).as("__xmax"),
      min(col(y)).as("__ymin"), max(col(y)).as("__ymax"))
    val keyed = withHilbertKey(
      df.crossJoin(broadcast(mm)),
      quantize(col(x), col("__xmin"), col("__xmax"), bits),
      quantize(col(y), col("__ymin"), col("__ymax"), bits),
      bits, "__hkey")
    keyed.repartitionByRange(numPartitions, col("__hkey"))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
  }

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
