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

    val docs = graft.core.Tables.documents(spark, sfDir)
    val emb = graft.core.Tables.embeddings(spark, sfDir)

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

    val metrics = Seq(
      metric("t06_candidate_join_volume") { t06CandVolume },
      metric("lsh_band_candidate_pairs") {
        graft.ext.Dedup.lshCandidates(docs, col("doc_id"), col("text")).count()
      },
      metric("ivf_cell_pair_volume") {
        graft.ext.IVF.assignTable(emb, "vec_id", "embedding", cells = 8, iters = 3)
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)
      },
      metric("docs") { docs.count() },
      metric("vectors") { emb.count() })

    metrics.foreach { case (n, v, t) =>
      println(f"""{"metric":"$n","value":$v,"probe_sec":$t%.1f}""")
    }

    val ivfVolume = metrics(2)._2
    val guard = 2000000000L // ~2e9 join rows ≈ the single-box ceiling
    def skip(q: String, vol: Long): Unit =
      println(s"""{"query":"$q","sf_dir":"$sfDir","sec":-1,""" +
        s""""skipped":"candidate volume $vol > guard $guard"}""")
    Seq("t06_jaccard_topk" -> t06CandVolume,
        "t16_dedup_clusters" -> 0L, "t27_cluster_survivors_lsh" -> 0L,
        "s12_knn_graph" -> ivfVolume, "s23_mutual_nn" -> ivfVolume).foreach {
      case (q, vol) =>
        if (vol > guard) skip(q, vol)
        else {
          val t = time(q)
          println(f"""{"query":"$q","sf_dir":"$sfDir","sec":$t%.3f}""")
        }
    }

    // Deployment-knob variants: the fixed fixture knobs (8 IVF cells,
    // 0.1 grid cells) make blocked pair volume Θ(n²/cells) — quadratic
    // when cells stay constant while n grows. The at-scale discipline
    // (s28's "bucket count scales with data") is cells ∝ n /
    // cellSize ∝ 1/√density, holding per-point candidate work constant;
    // these runs MEASURE that path at the same dir so the decade table
    // shows both the fixed-knob blowup and the knob that removes it.
    val nVec = emb.count()
    val cellsScaled = math.max(8, (nVec / 250L).toInt)
    val tKnn = metric(s"s12_scaled_cells_$cellsScaled") {
      graft.ext.Similarity.knnGraph(emb, "vec_id", "embedding",
        k = 3, cells = cellsScaled).count()
    }
    println(f"""{"query":"s12_knn_graph[cells=$cellsScaled]","sf_dir":"$sfDir","sec":${tKnn._3}%.3f,"edges":${tKnn._2}}""")
    val sizeScaled = 0.1 / math.sqrt((nVec / 2000L).toDouble.max(1.0))
    val tMnn = metric(f"s23_scaled_cell_$sizeScaled%.4f") {
      graft.ext.Similarity.mutualNN2d(emb, "vec_id", "embedding",
        cellSize = sizeScaled).count()
    }
    println(f"""{"query":"s23_mutual_nn[cellSize=$sizeScaled%.4f]","sf_dir":"$sfDir","sec":${tMnn._3}%.3f,"edges":${tMnn._2}}""")
    spark.stop()
  }
}
