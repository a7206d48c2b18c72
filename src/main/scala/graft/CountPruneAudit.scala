package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window => LWindow}

/** Dev harness: census of how much of each registered query's plan
  * SURVIVES under a count-only consumer. count() lets the optimizer
  * prune every column nobody aggregates — terminal window columns,
  * un-referenced aggregate expressions, and (Spark 4's unique-key join
  * removal) entire outer-join subtrees. Found in round 13 when t56's
  * whole span computation vanished under the bench's count() forcing
  * (66 of 276 queries lost SOME plan nodes; q04's z-score — the point
  * of the query — timed at 0). The bench/TimeQuery forcing action is
  * noop-write because of this census; the audit stays runnable so a
  * future count-shaped consumer can re-check the board.
  *
  * Usage: `sbt "runMain graft.CountPruneAudit [sfDir]"` — prints one
  * FLAG line per query whose count() plan holds fewer joins, windows,
  * or aggregates than its full plan. Plan-only: nothing executes.
  * NOT part of the shipped library; dev tooling like [[ScaleCheck]].
  */
object CountPruneAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def joins(p: LogicalPlan): Int = p.collect { case j: Join => j }.size
    def windows(p: LogicalPlan): Int = p.collect { case w: LWindow => w }.size
    def aggs(p: LogicalPlan): Int = p.collect { case a: Aggregate => a }.size
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val q = fn(spark, dir)
        val full = q.queryExecution.optimizedPlan
        val cnt = q.groupBy().count().queryExecution.optimizedPlan
        val (jf, jc) = (joins(full), joins(cnt))
        val (wf, wc) = (windows(full), windows(cnt))
        val (af, ac) = (aggs(full), aggs(cnt) - 1) // -1: the count itself
        if (jc < jf || wc < wf || ac < af) {
          flagged += 1
          println(s"FLAG $name: joins $jf->$jc windows $wf->$wc aggs $af->$ac")
        }
      } catch { case e: Throwable =>
        println(s"ERR $name: ${Option(e.getMessage).getOrElse("").take(80)}")
      }
    }
    println(s"AUDIT DONE: $flagged of ${SparkEntry.queries.size} queries lose plan nodes under count()")
    spark.stop()
  }
}
