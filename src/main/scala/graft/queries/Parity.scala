package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for exact float/type parity between Spark output and the
  * DuckDB oracle (see RelationalQueries doc for the rationale).
  */
object Parity {

  /** Order-independent exact sum for money-like doubles: cast each term to
    * DECIMAL(18,6) (both engines round the same IEEE double to the same
    * decimal), sum exactly, cast back to double. Eliminates the
    * accumulation-order ulp noise of plain double sums.
    */
  def decimalSum(c: Column, alias: String): Column =
    sum(c.cast("decimal(18,6)")).cast("double").as(alias)

  /** Calendar day as 'yyyy-MM-dd' string — strings compare identically
    * across engines; raw DATE/TIMESTAMP types don't always round-trip the
    * same through parquet + pandas.
    */
  def dayStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Timestamp to second precision as string (for date_trunc buckets). */
  def tsStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm:ss")
}
