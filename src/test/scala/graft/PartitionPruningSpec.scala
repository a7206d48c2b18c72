package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Parity

/** Evidence for the SCALE.md partitioned-layout claim: a date-partitioned
  * parquet write + a day filter produces a scan whose PartitionFilters
  * prune to the matching directories — the layout that makes time-bounded
  * queries touch days/total of 100 TB instead of all of it.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + day filter -> partition-pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Sinks.partitionedParquet(
      Tables.events(spark, sf).withColumn("day", Parity.dayStr(col("ts"))),
      dir, Seq("day"))

    val allDays = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("day="))
    assert(allDays > 5, s"expected multiple day partitions, got $allDays")

    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("isnotnull(day") || plan.contains("day#")),
      s"expected partition filters in:\n$plan")
    // pruning is observable: the scanned files all come from one partition
    val files = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-03")),
      s"scan leaked outside the pruned partition: ${files.take(3).mkString}")
  }
}
