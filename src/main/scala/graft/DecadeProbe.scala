package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the ×100-decade scale-evidence table (VERDICT r11
  * task #5): at a given testdata dir, times each member of the
  * candidate-density family (the queries whose sf1/sf0.1 ratios exceed
  * linear because the near-dup corpus makes candidate PAIRS grow
  * quadratically in copy multiplicity) AND prints the measured
  * candidate-space size that explains the ratio — so a super-linear
  * runtime decade can be matched to its measured pair count instead of
  * extrapolated.
  *
  * Candidate metrics per family:
  *  - t06: verified colliding-pair count ([[graft.ext.Dedup.jaccardPairs]]
  *    output rows — its runtime driver);
  *  - t16/t27: LSH band-collision candidate pairs
  *    ([[graft.ext.Dedup.lshCandidates]] rows);
  *  - s12/s23: Σ_cell n_c·(n_c−1)/2 over the IVF cell assignment — the
  *    pair volume the cell-blocked join feeds its top-k windows.
  *
  * Usage: `SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=target/sf10
  * SPARK_GRAFT_CPUS=8 sbt "runMain graft.DecadeProbe"`. Dev tooling like
  * [[Inflate]]/[[ScaleCheck]] — not part of the shipped library. Prints
  * one JSON line per family plus a total line.
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.loadNormalized(spark, sfDir, t).limit(1).count()
      catch { case e: Throwable =>
        System.err.println(s"[decade] warm-up $t failed: ${e.getMessage}") }
    }

    def time(name: String): Double =
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[decade] $name UNKNOWN"); -1.0
        case Some(fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[decade] $name FAILED: ${e.getMessage}")
            -1.0
          }
      }

    val emb = graft.core.Tables.embeddings(spark, sfDir)
    implicit val probeEnv: ProbeEnv = ProbeEnv(emb, sfDir)
    // ivf2only needs ONLY embeddings — branch before touching documents,
    // so an embeddings-only decade fixture (Inflate's table subset) works
    if (args.contains("ivf2only")) { ivf2Contrast(); spark.stop(); return }
    val docs = graft.core.Tables.documents(spark, sfDir)

    // candidate-space metrics (timed separately — they ARE extra passes)
    def metric(name: String)(f: => Long): (String, Long, Double) = {
      val t0 = System.nanoTime()
      val v = try f catch { case e: Throwable =>
        System.err.println(s"[decade] metric $name failed: ${e.getMessage}")
        -1L
      }
      (name, v, (System.nanoTime() - t0) / 1e9)
    }

    // t06's candidate volume WITHOUT running its join: the inverted-index
    // self-join emits exactly Σ_shingle C(df,2) rows, computable from the
    // df histogram in one narrow pass. This is the number that decides
    // whether the uncapped exact form is even runnable at a decade —
    // past the guard the probe reports the count and SKIPS the query
    // (the documented answer at that volume is the capped/LSH/prefix
    // forms t07/t16/t40, not a bigger box).
    val t06CandVolume = graft.ext.Dedup
      .shingleRows(docs, col("doc_id"), col("text"), 3)
      .select(xxhash64(col("s")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1) / 2).cast("long"))
      .head().getLong(0)

    // t54's capped volume: same histogram, df > 20 stop-listed — the
    // per-shingle fan-out bound that keeps the exact form runnable at
    // any corpus size (pairs per shingle <= C(20,2)).
    val t54CandVolume = graft.ext.Dedup
      .shingleRows(docs, col("doc_id"), col("text"), 3)
      .select(xxhash64(col("s")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20)
      .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0)).cast("long"))
      .head().getLong(0)

    val metrics = Seq(
      metric("t06_candidate_join_volume") { t06CandVolume },
      metric("t54_capped_candidate_volume") { t54CandVolume },
      metric("lsh_band_candidate_pairs") {
        graft.ext.Dedup.lshCandidates(docs, col("doc_id"), col("text")).count()
      },
      metric("ivf_cell_pair_volume_fixed8") {
        graft.ext.IVF.assignTable(emb, "vec_id", "embedding", cells = 8, iters = 3)
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)
      },
      // the volume the REGISTERED s12 actually feeds its join since r13:
      // cells derive from the corpus count (constant expected occupancy)
      metric("ivf_cell_pair_volume_derived") {
        val cells = graft.ext.Similarity.autoCells(emb.count())
        graft.ext.IVF.assignTable(emb, "vec_id", "embedding", cells, iters = 3)
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)
      },
      metric("docs") { docs.count() },
      metric("vectors") { emb.count() })

    metrics.foreach { case (n, v, t) =>
      println(f"""{"metric":"$n","value":$v,"probe_sec":$t%.1f}""")
    }

    def metricVal(name: String): Long =
      metrics.find(_._1 == name).map(_._2).getOrElse(-1L)
    val ivfVolume = metricVal("ivf_cell_pair_volume_derived") // what s12/s23 run
    val guard = 2000000000L // ~2e9 join rows ≈ the single-box ceiling
    def skip(q: String, vol: Long): Unit =
      println(s"""{"query":"$q","sf_dir":"$sfDir","sec":-1,""" +
        s""""skipped":"candidate volume $vol > guard $guard"}""")
    Seq("t06_jaccard_topk" -> t06CandVolume,
        "t54_jaccard_topk_capped" -> t54CandVolume,
        "t16_dedup_clusters" -> 0L, "t27_cluster_survivors_lsh" -> 0L,
        "s12_knn_graph" -> ivfVolume, "s23_mutual_nn" -> ivfVolume).foreach {
      case (q, vol) =>
        if (vol > guard) skip(q, vol)
        else {
          val t = time(q)
          println(f"""{"query":"$q","sf_dir":"$sfDir","sec":$t%.3f}""")
        }
    }

    // Fixture-knob CONTRAST variants: since r13 the REGISTERED s12/s23
    // derive their blocking knobs from the corpus count (autoCells /
    // autoCellSize — constant expected occupancy, linear pair volume),
    // so the primary rows above probe the deployment path directly.
    // These runs keep the r12 fixture knobs (8 IVF cells, 0.1 grid)
    // measurable for the decade table's "what the fixed knob would
    // cost" column — guard-skipped once their Θ(n²/cells) volume passes
    // the single-box ceiling.
    val nVec = emb.count()
    val cellsAuto = graft.ext.Similarity.autoCells(nVec)
    val sizeAuto = graft.ext.Similarity.autoCellSize(nVec)
    println(s"""{"metric":"derived_knobs","cells":$cellsAuto,"cellSize":$sizeAuto}""")
    val fixedVolume = metricVal("ivf_cell_pair_volume_fixed8")
    if (fixedVolume > guard) {
      skip("s12_knn_graph[fixed cells=8]", fixedVolume)
      skip("s23_mutual_nn[fixed cellSize=0.1]", fixedVolume)
    } else {
      val tKnn = metric("s12_fixed_cells_8") {
        graft.ext.Similarity.knnGraph(emb, "vec_id", "embedding",
          k = 3, cells = 8).count()
      }
      println(f"""{"query":"s12_knn_graph[fixed cells=8]","sf_dir":"$sfDir","sec":${tKnn._3}%.3f,"edges":${tKnn._2}}""")
      val tMnn = metric("s23_fixed_cell_0.1") {
        graft.ext.Similarity.mutualNN2d(emb, "vec_id", "embedding",
          cellSize = 0.1).count()
      }
      println(f"""{"query":"s23_mutual_nn[fixed cellSize=0.1]","sf_dir":"$sfDir","sec":${tMnn._3}%.3f,"edges":${tMnn._2}}""")
    }

    ivf2Contrast()
    spark.stop()
  }

  /** Two-level quantizer flop-wall contrast (r13: s31/s32): at EQUAL
    * leaf count, the flat quantizer's train+assign pays n·cells·d flops
    * per pass where the hierarchical residual form pays n·(k1+k2)·d —
    * the measured answer to SCALE.md's "past ~10⁷ vectors per shard,
    * move to a two-level coarse quantizer" note. Both timings are
    * END-TO-END (train + assign + count) at the corpus-derived leaf
    * count the registered deployment would use. Runs standalone via
    * `runMain graft.DecadeProbe ivf2only` so a decade point doesn't
    * re-pay the full probe sweep.
    */
  private def ivf2Contrast()(implicit env: ProbeEnv): Unit = {
    import env._
    val nVec = emb.count()
    val cellsAuto = graft.ext.Similarity.autoCells(nVec)
    val (k1, k2) = graft.ext.IVF.autoK1K2(nVec)
    // noop-sink forcing, NOT count(): under count() Catalyst prunes the
    // assignment projection itself (the r13 CountPruneAudit lesson) —
    // the pre-r14 "assign-only" rows here timed a bare scan+count, which
    // is why they read sub-linear in cells (0.09/0.16/0.38 s across
    // three decades for a flop count that grew ×1000). The noop sink
    // materializes the cell column the probe exists to time.
    def timed(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val sec = try {
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[decade] $name failed: ${e.getMessage}"); -1.0 }
      println(f"""{"query":"$name","sf_dir":"$sfDir","sec":$sec%.3f,"n_vec":$nVec}""")
    }
    timed(s"ivf_flat_train_assign[cells=$cellsAuto]") {
      graft.ext.IVF.assignTable(emb, "vec_id", "embedding",
        cellsAuto, iters = 3).select(col("vid"), col("cell"))
    }
    timed(s"ivf2_train_assign[k1=$k1,k2=$k2]") {
      graft.ext.IVF.twoLevelAssignTable(emb, "vec_id", "embedding",
        k1, k2, iters = 3)
    }
    // assignment-ONLY contrast (models pre-trained): this is the
    // component the flop wall lives in — training's decimal-sum update
    // is Θ(n·d) regardless of cell count and dominates end-to-end at
    // probe scales, masking the n·cells·d vs n·(k1+k2)·d assignment gap
    // that decides the next decade.
    val v = emb.select(col("vec_id").as("vid"),
      col("embedding").cast("array<double>").as("v"))
    val l1flat = graft.ext.IVF.kmeansCentroids(
      emb, "vec_id", "embedding", cellsAuto, iters = 3)
    timed(s"ivf_flat_assign_only[cells=$cellsAuto]") {
      graft.ext.IVF.assignCells(v, l1flat).select(col("vid"), col("cell"))
    }
    // the REGISTERED blocked form end-to-end (s12's knnGraphAuto): at or
    // above Similarity.FlatToIvf2Vectors this exercises the two-level
    // leaf branch — the decade row showing the registered query staying
    // near-linear (constant leaf occupancy × n pairs) where the flat
    // kernel pays its measured 12× on assignment alone
    timed(s"s12_knn_graph_auto[n=$nVec]") {
      graft.ext.Similarity.knnGraphAuto(emb, "vec_id", "embedding", k = 3)
    }
    val (l1h, l2h, _) = graft.ext.IVF.twoLevelModel(
      emb, "vec_id", "embedding", k1, k2, iters = 3)
    timed(s"ivf2_assign_only[k1=$k1,k2=$k2]") {
      // the L1 cell is forced through the residual join key; the L2 cell
      // is forced by the noop sink's output columns
      val res = graft.ext.IVF.assignCells(v, l1h)
        .join(broadcast(l1h), "cell")
        .select(col("vid"),
          zip_with(col("v"), col("c"), (a, b) => a - b).as("v"))
      graft.ext.IVF.assignCells(res, l2h).select(col("vid"), col("cell"))
    }
  }

  private case class ProbeEnv(emb: org.apache.spark.sql.DataFrame, sfDir: String)
}
