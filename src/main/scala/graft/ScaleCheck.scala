package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Scale exercise: run the heaviest iterative pipelines (t16-style LSH
  * near-dup clustering, s08-style semantic dedup) on a synthetically
  * multiplied + skew-injected fixture (~sf1 when SPARK_GRAFT_SCALE_MULT=10
  * over sf0.1), with a stage-metrics listener asserting the partition
  * story holds:
  *
  *  - every stage that processes a non-trivial record volume runs
  *    MULTI-TASK (a single-task stage over big data is the local-mode bug
  *    that becomes the 1000-executor bottleneck);
  *  - per-stage max/median task-time skew is reported, so a hot LSH
  *    bucket or k-means cell shows up as a number, not an anecdote;
  *  - the injected structure is verified exactly (the 400-copy hot
  *    cluster must come back as ONE component with 400 members; scaled
  *    copies of each doc must cluster with their original), so the scale
  *    run is also a correctness run.
  *
  * Usage: `sbt "runMain graft.ScaleCheck"` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_MULT). Prints one JSON line;
  * exits nonzero on any assertion failure. Measured results live in
  * SCALE.md ("Scale exercise" section).
  */
object ScaleCheck {

  /** Per-stage snapshot: task count, record volume, task-time skew. */
  final case class StageStat(stageId: Int, name: String, numTasks: Int,
                             records: Long, maxTaskMs: Long, runMs: Long)

  final class StageStats extends SparkListener {
    val stats: mutable.ArrayBuffer[StageStat] = mutable.ArrayBuffer.empty
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val recs =
        if (m == null) 0L
        else m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
      val run = (for {s <- si.submissionTime; c <- si.completionTime}
        yield c - s).getOrElse(0L)
      stats.synchronized {
        stats += StageStat(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, recs, m match { case null => 0L; case mm => mm.executorRunTime }, run)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StageStats
    spark.sparkContext.addSparkListener(listener)

    val out = new StringBuilder("{")
    var failed = List.empty[String]
    def check(cond: Boolean, what: String): Unit =
      if (!cond) failed ::= what

    // ---------- scaled + skewed documents fixture ----------
    // mult near-copies of every doc (suffix perturbation → jaccard just
    // under 1, so clusters must MERGE copies with originals, not only
    // exact-dup them) plus a 400-copy hot near-dup cluster of one doc —
    // the skewed LSH bucket / giant component case. Staged to parquet so
    // the scan partitions like real input, not like a local relation.
    val base = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val copies = (0 until mult).map { i =>
      if (i == 0) base
      else base.select((col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        concat(col("text"), lit(s" scalecopy$i")).as("text"))
    }.reduce(_ union _)
    val hotId = 42L
    val hot = base.filter(col("doc_id") === hotId)
      .crossJoin(spark.range(1, 400).select(col("id")))
      .select((lit(900_000_000L) + col("id")).as("doc_id"),
        concat(col("text"), lit(" hotcopy"), col("id") % 7).as("text"))
    val docDir = s"/tmp/graft_scale/documents_x$mult"
    copies.union(hot).write.mode("overwrite").parquet(docDir)
    val docs = spark.read.parquet(docDir)
    val nDocs = docs.count()

    // ---------- t16-shape: LSH near-dup clustering at scale ----------
    val t0 = System.nanoTime()
    val pairs = graft.ext.Dedup
      .minhashNearDups(docs, col("doc_id"), col("text"))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .union(docs.select(col("doc_id"), col("doc_id")))
    val comp = graft.ext.Dedup
      .connectedComponents(pairs, col("id_a"), col("id_b"))
      .localCheckpoint()
    val tCluster = (System.nanoTime() - t0) / 1e9

    // the hot cluster: original 42 + 399 hot copies + its mult suffix
    // copies all share >=0.5 jaccard with the original → one component
    val hotComp = comp.filter(col("node") === hotId)
      .select(col("component")).first().getLong(0)
    val hotSize = comp.filter(col("component") === hotComp).count()
    check(hotSize >= 400, s"hot cluster merged: size=$hotSize (want >=400)")
    // every scaled copy clusters with its original: component count must
    // stay ~nBase, not ~nDocs (copies collapse); allow docs too short to
    // shingle (< 3 words) to stay singletons across copies
    val nComponents = comp.select(col("component")).distinct().count()
    val nBase = base.count()
    check(nComponents <= nBase + mult.toLong * 50,
      s"copies collapsed into base components: $nComponents components for $nDocs docs (base=$nBase)")

    // ---------- s08-shape: semantic dedup at scale ----------
    // mult copies of every vector (identical → cos 1 with the original →
    // every non-first copy must drop). cells scale with n (~n/600) — the
    // deployment rule SCALE.md documents.
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val embScaled = (0 until mult).map { i =>
      if (i == 0) emb
      else emb.select((col("vec_id") + lit(i * 10_000_000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ union _)
    val embDir = s"/tmp/graft_scale/embeddings_x$mult"
    embScaled.write.mode("overwrite").parquet(embDir)
    val embBig = spark.read.parquet(embDir)
    val nVec = embBig.count()
    val cells = math.max(8, (nVec / 600).toInt)
    val t1 = System.nanoTime()
    val survivors = graft.ext.Similarity
      .clusterDedup(embBig, "vec_id", "embedding",
        threshold = 0.35, cells = cells)
      .count()
    val tDedup = (System.nanoTime() - t1) / 1e9
    // identical copies share a cell (same vector → same nearest centroid),
    // so at most one survivor per original plus the originals' own
    // near-dup structure — never more than the base vector count
    check(survivors <= nVec / mult,
      s"exact-copy drop at scale: $survivors survivors of $nVec (base=${nVec / mult})")

    // ---------- s12-shape: kNN graph at scale ----------
    // the graph inherits clusterDedup's cell-blocking geometry but adds
    // the per-node top-k window; the assertions pin (a) identical copies
    // are each other's rank-1 neighbors THROUGH the scaled index, (b) no
    // node exceeds k edges, (c) the stage story stays multi-task.
    val t2 = System.nanoTime()
    val knn = graft.ext.Similarity
      .knnGraph(embBig, "vec_id", "embedding", k = 3, cells = cells)
      .localCheckpoint()
    val nEdges = knn.count()
    val tKnn = (System.nanoTime() - t2) / 1e9
    check(nEdges <= nVec * 3, s"kNN graph edge bound: $nEdges > 3·$nVec")
    // vec 0's exact copy lives at id 10_000_000: cos 1 → mutual rank-1
    val rank1Of0 = knn.filter(col("q_id") === 0L && col("rn") === 1)
      .select(col("c_id"), col("cos")).first()
    check(rank1Of0.getDouble(1) == 1.0,
      s"vec 0's rank-1 neighbor must be an exact copy (cos 1.0), got $rank1Of0")

    // ---------- partition-story assertions ----------
    // every stage reading >=100k records must be multi-task; the only
    // single-task stages allowed at ANY volume are the documented
    // driver-side materializations (k-means centroid collects: k rows)
    val big = listener.stats.synchronized { listener.stats.toVector }
      .filter(_.records >= 100_000)
    val singleBig = big.filter(_.numTasks <= 1)
    check(singleBig.isEmpty,
      s"single-task big stages: ${singleBig.map(s => s"${s.stageId}:${s.name}(${s.records})").mkString(", ")}")
    val worstSkew = big.sortBy(-_.runMs).take(5)
      .map(s => f""""s${s.stageId}":{"tasks":${s.numTasks},"records":${s.records},"run_ms":${s.runMs}}""")
      .mkString(",")

    out ++= s""""n_docs":$nDocs,"n_vec":$nVec,"mult":$mult,"cells":$cells,"""
    out ++= f""""t_cluster_sec":$tCluster%.1f,"t_semdedup_sec":$tDedup%.1f,"t_knn_sec":$tKnn%.1f,"""
    out ++= s""""hot_cluster_size":$hotSize,"components":$nComponents,"survivors":$survivors,"knn_edges":$nEdges,"""
    out ++= s""""big_stages":${big.size},"top_stages":{$worstSkew},"""
    out ++= s""""failed":[${failed.reverse.map("\"" + _ + "\"").mkString(",")}]}"""
    println(out.result())
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
