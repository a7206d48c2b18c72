package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The reference's two sinks (SURVEY.md §2.2). */
object Sinks {

  /** K1: idempotent parquet layer write. At scale, callers should
    * `.repartition(n, keyCols)` or partitionBy a date column first; this
    * helper deliberately leaves partitioning to the caller.
    */
  def parquetOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K2: single-file CSV export for BI tools
    * (reference jobs/03_silver_to_gold.py:5-17). `coalesce(1)` makes the
    * final write single-threaded BY DESIGN (one file contract) — only for
    * small gold marts, never for fact-scale data.
    */
  def singleFileCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("delimiter", ",")
      .option("encoding", "UTF-8")
      .csv(path)

  /** ORC layer write — the second columnar format Spark ships natively
    * (vectorized reader, predicate pushdown, column pruning — same scan
    * posture as parquet). Round-trip evidenced in TimeSeriesSpec.
    */
  def orcOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Date/key-partitioned parquet layout — the 100 TB fact-table shape:
    * queries filtered on `partitionCols` scan only matching directories
    * (pruning evidenced in PartitionPruningSpec).
    */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table: both sides of a repeated fact-fact
    * join written this way co-locate and join with zero shuffle
    * (evidenced in BucketingSpec).
    */
  def bucketedTable(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
