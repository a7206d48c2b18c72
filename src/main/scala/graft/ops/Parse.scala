package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Text-layout parsers generalized from the reference's two silver parsers
  * (reference jobs/02_bronze_to_silver.py:18-25 whitespace tokens;
  * :54-61 fixed-width). Pure narrow transforms — filter/split/substring/cast
  * only, no shuffle, fully pushed into the scan stage by Catalyst, so they
  * stream at input bandwidth regardless of scale.
  */
object Parse {

  /** One whitespace-token field: token index (0-based), output name, cast.
    * Out-of-range index → null (load-bearing: short rows are then dropped
    * by [[Cleanse.dropNullRows]], SURVEY.md §1.4); unparsable cast → null
    * (requires ANSI mode off, the engine default).
    */
  final case class TokenField(index: Int, name: String, cast: DataType)

  /** Tokenize `value` lines on whitespace and project typed fields,
    * skipping lines starting with `commentPrefix`.
    */
  def tokens(fields: Seq[TokenField], commentPrefix: Option[String] = Some("%"),
             value: Column = col("value"))(df: DataFrame): DataFrame = {
    // cast-failure → null needs non-ANSI semantics regardless of how the
    // caller built the session; `get` (vs getItem) is index-safe in BOTH
    // modes — an empty line yields one token and index 5 must be null,
    // not SparkArrayIndexOutOfBoundsException (found by GraftProps).
    graft.core.GraftConf.ensure(df.sparkSession)
    // The comment filter tests the UNTRIMMED line while the tokenizer
    // trims — deliberate: it replicates the reference exactly
    // (jobs/02_bronze_to_silver.py:18 filters raw `value`), so a comment
    // line with LEADING whitespace is parsed as data there and here both.
    val base = commentPrefix match {
      case Some(p) => df.filter(!value.startsWith(p))
      case None    => df
    }
    val parts = split(trim(value), "\\s+")
    base.select(fields.map(f =>
      get(parts, lit(f.index)).cast(f.cast).as(f.name)): _*)
  }

  /** One fixed-width field: 1-based start position, length, output name,
    * optional cast applied after trim.
    */
  final case class FixedField(pos: Int, len: Int, name: String,
                              cast: Option[DataType] = None)

  /** Project typed fields out of fixed-width `value` lines. */
  def fixedWidth(fields: Seq[FixedField], value: Column = col("value"))(
      df: DataFrame): DataFrame = {
    graft.core.GraftConf.ensure(df.sparkSession)
    df.select(fields.map { f =>
      val c = trim(substring(value, f.pos, f.len))
      f.cast.fold(c)(t => c.cast(t)).as(f.name)
    }: _*)
  }

  /** Validation: drop rows with nulls in `subset` (the reference's
    * dropna(subset=...), jobs/02:28,63).
    */
  def dropNullRows(subset: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop(subset)
}
