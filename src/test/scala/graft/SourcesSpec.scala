package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Source-format matrix: parquet and text are exercised everywhere,
  * CSV round-trips in BucketingSpec — this covers the JSON source
  * (schema inference + typed access) against the same data the
  * get_json_object path (q24) reads as strings.
  */
class SourcesSpec extends SparkSpec {

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
}
