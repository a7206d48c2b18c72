package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Source-format matrix: parquet and text are exercised everywhere,
  * CSV round-trips in BucketingSpec — this covers the JSON source
  * (schema inference + typed access) against the same data the
  * get_json_object path (q24) reads as strings, plus parquet schema
  * evolution (the append-with-new-column case every long-lived dataset
  * hits).
  */
class SourcesSpec extends SparkSpec {

  test("parquet schema evolution: mergeSchema unions columns across files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // v1 files: (id, a) — v2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, "z", 30.0)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id"))
    val rows = merged.orderBy("id")
      .select("id", "a", "b").as[(Long, String, Option[Double])].collect()
    // old files surface the new column as null — no rewrite needed
    assert(rows.toSeq === Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some(30.0))))
    // without mergeSchema ONE footer wins (whichever file is picked) —
    // documents WHY the option matters for evolved datasets: the result
    // is exactly a single file's schema, never a computed union/other mix
    val unmerged = spark.read.parquet(dir).columns.sorted.toSeq
    assert(unmerged == Seq("a", "b", "id") || unmerged == Seq("a", "id"),
      s"expected one file's schema verbatim, got $unmerged")
  }

  test("spark.read.json parses events.props identically to get_json_object") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val events = Tables.events(spark, sf)
    events.select(col("props")).write.mode("overwrite").text(dir)

    val viaJson = spark.read.json(dir)
    assert(viaJson.columns.toSeq == Seq("k"))
    val sumJson = viaJson.agg(sum("k")).first().getLong(0)
    val sumStr = events
      .agg(sum(get_json_object(col("props"), "$.k").cast("long"))).first().getLong(0)
    assert(sumJson == sumStr)
    assert(viaJson.count() == events.count())
  }

  test("from_json with explicit schema gives typed struct access") {
    val events = Tables.events(spark, sf)
    val parsed = events.select(
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
    val sumTyped = parsed.agg(sum("p.k")).first().getLong(0)
    val sumStr = events
      .agg(sum(get_json_object(col("props"), "$.k").cast("long"))).first().getLong(0)
    assert(sumTyped == sumStr)
  }

  test("graft-synthetic DSv2: deterministic rows, short-name resolution") {
    import spark.implicits._
    val df = spark.read.format("graft-synthetic")
      .option("rows", "1000").option("partitions", "8").load()
    assert(df.count() == 1000)
    assert(df.columns.toSeq == Seq("id", "bucket", "value"))
    // the generator formula, re-derived independently
    val got = df.filter(col("id") < 3).orderBy("id")
      .as[(Long, Int, Double)].collect().toSeq
    def h(id: Long) = (id * 2654435761L + 40503L) % 4294967296L
    val want = (0L until 3L).map(i => (i, (h(i) % 32L).toInt, (h(i) % 100000L) / 1000.0))
    assert(got == want)
  }

  test("graft-synthetic DSv2: pushed id range prunes partitions at planning time") {
    val df = spark.read.format("graft-synthetic")
      .option("rows", "1000").option("partitions", "8").load()
    // 8 ranges of 125 ids; id < 250 overlaps exactly 2 of them
    val pruned = df.filter(col("id") < 250)
    assert(pruned.rdd.getNumPartitions == 2,
      s"expected 2 surviving range partitions, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() == 250, "residual filter must keep exact semantics")
    // the full scan keeps all 8
    assert(df.rdd.getNumPartitions == 8)
    // a closed interval prunes from both ends
    val band = df.filter(col("id") >= 500 && col("id") <= 624)
    assert(band.rdd.getNumPartitions == 1)
    assert(band.count() == 125)
  }

  test("graft-synthetic DSv2: DPP runtime filter prunes partitions from broadcast join keys") {
    import org.apache.spark.sql.functions._
    // the dim's selective predicate is on grp = id div 6250 — NOT
    // invertible to a key bound, so planning-time pushdown/inference sees
    // nothing; ONLY the runtime (DPP) In-filter from the broadcast side
    // can prune. grp=4 keys are exactly fact partition 4's id range.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan → metrics reachable
    try {
      val fact = spark.read.format("graft-synthetic")
        .option("rows", "100000").option("partitions", "16").load()
      val dim = spark.range(0, 100000)
        .select(col("id").as("k"), expr("id div 6250").cast("int").as("grp"))
        .filter(col("grp") === 4)
        .select(col("k"))
      val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
      // collect(), not count(): count() builds its OWN aggregate plan —
      // the metrics below must come from the same QueryExecution that ran
      assert(joined.collect().length == 6250)
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("RuntimeFilters: [dynamicpruningexpression"),
        s"DPP filter must reach the v2 scan: $plan")
      // partition-level evidence: the scan PRODUCED only the probed
      // partition's rows (6250 of 100k) — runtime pruning, not row filtering
      val scanRows = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.metrics("numOutputRows").value
      }.sum
      assert(scanRows == 6250L,
        s"runtime filter must prune 15 of 16 partitions: scan produced $scanRows rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("graft-synthetic DSv2: column pruning reaches the reader") {
    val df = spark.read.format("graft-synthetic")
      .option("rows", "100").option("partitions", "2").load()
      .select("bucket")
    // the scan's read schema is the pruned one (reader never computes id/value)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("bucket") && !scan.contains("value"),
      s"scan should read only 'bucket': $scan")
    assert(df.distinct().count() <= 32)
  }
}
