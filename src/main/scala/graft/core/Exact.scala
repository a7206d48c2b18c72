package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Cross-engine-exact arithmetic helpers shared by batch queries and
  * streaming aggregates (single definition — a precision change here
  * changes every consumer in lockstep).
  */
object Exact {

  /** Order-independent exact sum for money-like doubles: cast each term to
    * DECIMAL(18,6) (both engines round the same IEEE double to the same
    * decimal), sum exactly, cast back to double (exact — values fit 2^53).
    * Plain double sums differ across engines in the last ulps because
    * accumulation order differs.
    */
  def decimalSum(c: Column, alias: String): Column =
    decimalSumExpr(c).as(alias)

  /** Unaliased form, for composition inside other expressions. */
  def decimalSumExpr(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")
}
