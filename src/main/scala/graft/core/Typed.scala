package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` facade over the same tables [[Tables]] serves as
  * DataFrames — the API tier for pipeline code where compile-time column
  * safety pays (a misspelled field is a compile error, not an analysis
  * exception three stages later).
  *
  * Design boundary, deliberately: the ENGINE's operators stay
  * `DataFrame => DataFrame` (Column-expression plans keep every transform
  * inside Catalyst/codegen — a typed `.map` would deserialize whole rows
  * and opt out of pushdown/pruning). The typed layer is for USER pipeline
  * composition at the edges: load typed, `.filter(_.l_quantity > 10)`
  * when clarity wins, `.toDF` into the operator library for anything
  * hot. TypedSpec pins the one semantic trap: typed filters on nullable
  * primitive fields NPE on null rows unless modeled as Option — which is
  * why every numeric field here is `Option`-typed except the keys the
  * fixtures guarantee.
  */
object Typed {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Option[Double], props: Option[String])

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(
      vec_id: Long, embedding: Seq[Float], label: Option[Int])

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
