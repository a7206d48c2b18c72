package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables, Typed}

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed loaders round-trip the DataFrame schemas with no row loss") {
    assert(Typed.lineitem(spark, sf).count() == Tables.lineitem(spark, sf).count())
    assert(Typed.events(spark, sf).count() == Tables.events(spark, sf).count())
    assert(Typed.documents(spark, sf).count() == Tables.documents(spark, sf).count())
    assert(Typed.embeddings(spark, sf).count() == Tables.embeddings(spark, sf).count())
  }

  test("typed filter == Column filter on the same predicate") {
    val typed = Typed.lineitem(spark, sf)
      .filter(l => l.l_quantity > 25.0 && l.l_returnflag == "R")
      .count()
    val untyped = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 25.0 && col("l_returnflag") === "R")
      .count()
    assert(typed == untyped && typed > 0)
  }

  test("typed map stays correct but LOSES scan pruning — the documented trade") {
    // Column path: only 2 columns reach the scan
    val colPlan = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(colPlan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      colPlan)
    // typed map: the lambda is opaque to Catalyst → full-row read schema.
    // Same answer, more I/O — exactly why the engine's operators are
    // Column-based and the typed tier is for edges.
    val ds = Typed.lineitem(spark, sf).map(l => (l.l_orderkey, l.l_quantity))
    val dsPlan = ds.queryExecution.executedPlan.toString
    assert(dsPlan.contains("l_shipdate"), dsPlan)
    val a = ds.toDF("k", "q").agg(sum("q")).as[Double].head()
    val b = Tables.lineitem(spark, sf).agg(sum("l_quantity")).as[Double].head()
    assert(a == b)
  }

  test("typed aggregation via groupByKey matches the DataFrame aggregate") {
    val typed = Typed.events(spark, sf)
      .filter(_.value.isDefined)
      .groupByKey(_.event_type)
      .count()
      .collect().toMap
    val untyped = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(typed == untyped)
  }
}
