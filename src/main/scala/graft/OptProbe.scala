package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r15 optimization-round dev harness: run named queries (or `all`) under a
  * SparkListener and report, per query, the wall time next to the job/stage/
  * task counts and the summed executor run/CPU/GC time. The gap between
  * wall and per-core task time is driver-side cost (planning, codegen,
  * scheduling, collect barriers) — the thing to shrink for the many
  * sub-second board entries where data volume is trivial at sf0.1.
  * Usage: `sbt "runMain graft.OptProbe s40_ann_ivfpq_residual ..."` or
  * `sbt "runMain graft.OptProbe all"`; SPARK_GRAFT_SF_DIR / _CPUS as Bench.
  */
object OptProbe {
  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var runMs = 0L
    @volatile var cpuMs = 0L
    @volatile var gcMs = 0L
    @volatile var shufWrite = 0L
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; runMs = 0; cpuMs = 0; gcMs = 0; shufWrite = 0 }
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += e.stageInfo.numTasks
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        runMs += m.executorRunTime
        cpuMs += m.executorCpuTime / 1000000L
        gcMs += m.jvmGCTime
        shufWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.loadNormalized(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val reg = SparkEntry.queries ++ SparkEntry.benchOnly
    val names: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("all"))) reg.keys.toSeq.sorted
      else args.toSeq
    println(f"${"query"}%-28s ${"wall"}%7s ${"jobs"}%5s ${"stgs"}%5s ${"tasks"}%6s ${"runS"}%7s ${"cpuS"}%7s ${"gcS"}%6s ${"shufMB"}%7s")
    names.foreach { name =>
      reg.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          // run 1 = warm codegen caches (same min-of-two idea as Bench);
          // run 2 is the instrumented one
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Thread.sleep(300)
            acc.reset()
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300) // let async listener events drain
            println(f"$name%-28s $wall%7.2f ${acc.jobs}%5d ${acc.stages}%5d ${acc.tasks}%6d ${acc.runMs / 1e3}%7.2f ${acc.cpuMs / 1e3}%7.2f ${acc.gcMs / 1e3}%6.2f ${acc.shufWrite / 1e6}%7.1f")
          } catch { case e: Throwable =>
            println(s"$name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
