package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Evidence for the SCALE.md bucketing claim: two tables bucketed on the
  * join key co-locate, and the join plans WITHOUT a shuffle exchange on
  * either side — the 100 TB fact-fact join strategy, demonstrated on the
  * real plan, not just asserted.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero ShuffleExchange") {
    // default warehouse dir = ./spark-warehouse (gitignored); the
    // warehouse conf is static and can't move after session start
    // force the shuffle-visible path: no broadcast, no AQE rewrite noise
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Sinks.bucketedTable(
        Tables.lineitem(spark, sf), "li_bucketed", 8, Seq("l_orderkey"))
      graft.sources.Sinks.bucketedTable(
        Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed", 8, Seq("l_orderkey"))

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      val physical = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (bucket co-location);
      // only the final aggregate exchanges
      val joinPart = physical.split("HashAggregate").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$physical")
      // and it still computes the right thing
      val n = joined.agg(sum("q")).first().getDouble(0)
      val expected = Tables.lineitem(spark, sf).agg(sum("l_quantity")).first().getDouble(0)
      assert(n == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("gold CSV export round-trips through spark.read.csv") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val kpis = graft.SparkEntry.queries("c01_climate_kpis")(spark, sf)
    graft.sources.Sinks.singleFileCsv(kpis, s"$dir/kpis")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/kpis")
    assert(back.count() == kpis.count())
    assert(back.columns.toSeq == kpis.columns.toSeq)
  }
}
