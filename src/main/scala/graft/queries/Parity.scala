package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for exact float/type parity between Spark output and the
  * DuckDB oracle (see RelationalQueries doc for the rationale).
  */
object Parity {

  /** See [[graft.core.Exact.decimalSum]] — single definition, forwarded
    * here for the query registries' convenience.
    */
  def decimalSum(c: Column, alias: String): Column =
    graft.core.Exact.decimalSum(c, alias)

  /** Calendar day as 'yyyy-MM-dd' string — strings compare identically
    * across engines; raw DATE/TIMESTAMP types don't always round-trip the
    * same through parquet + pandas.
    */
  def dayStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Timestamp to second precision as string (for date_trunc buckets). */
  def tsStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm:ss")
}
