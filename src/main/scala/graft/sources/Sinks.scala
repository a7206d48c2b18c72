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
}
