package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-footer costs land here, not on whichever
    // query happens to run first (measured ~6 s of pure first-query noise).
    // Per-table try: one missing/odd table must not abort the rest of the
    // warm-up (r4 shipped exactly that bug — the raw `events` load threw on
    // TIMESTAMP(NANOS) and silently skipped the remaining tables + q01).
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables.loadNormalized(spark, sfDir, t).limit(1).count()
      catch { case e: Throwable => System.err.println(s"[bench] warm-up $t failed: ${e.getMessage}") }
    }
    try SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case e: Throwable => System.err.println(s"[bench] warm-up query failed: ${e.getMessage}") }
    // min of two runs per query: damps shared-machine load spikes without
    // hiding real cost (both runs rebuild the full plan; only JVM/codegen
    // warmth carries over, which the warm-up pass already granted).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Double.NaN
        }
      }
      // a failed query reports -1, never its time-to-exception (a broken
      // query must not read as a speedup)
      name -> (if (times.exists(_.isNaN)) -1.0 else times.min)
    }
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    // Contention guard (r4's driver numbers were ~1.8× the uncontended truth
    // because another build was running): record host CPU count and the
    // 1-minute loadavg taken at sweep end, so a contended snapshot is
    // self-documenting instead of reading as a code regression.
    val hostCpus = Runtime.getRuntime.availableProcessors()
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def jsonLine(rs: Iterable[(String, Double)]): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.values.filter(_ >= 0).sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","host_cpus":$hostCpus,"loadavg_1m":${fmt(loadAvg)}}"""
    }
    // The driver keeps only a ~2k-char tail of stdout; the full 80-query
    // map doesn't fit, so stdout carries the headline subset (cost drivers
    // + one per operator family) and the complete per-query map goes to a
    // file. `total` always sums over ALL measured queries.
    val headline = Seq(
      "q01_pricing_summary", "q02_kpi_by_year", "q03_star_join_revenue",
      "q04_zscore_events", "q23_hourly_agg", "q25_rank_family",
      "q29_asof_join", "q37_range_frame", "q43_kl_divergence",
      "q44_equidepth_hist", "c03_climate_fact", "t05_exact_dedup",
      "t06_jaccard_topk", "t07_minhash_lsh", "t13_pack_bins", "t14_tfidf",
      "t16_dedup_clusters", "s01_cosine_topk", "s04_ann_ivf",
      "st01_session_agg", "q47_merge_upsert", "q52_psi_drift",
      "s06_embedding_dedup", "q58_sessionize", "t26_bloom_decontaminate",
      "s07_ann_pq", "s08_semantic_dedup", "st03_dedup_enrich_agg",
      "q61_zorder_layout", "q63_pagerank_parts", "s10_matryoshka_overlap",
      "t28_leakage_safe_split", "s11_int8_quant", "s12_knn_graph",
      "s13_ann_int8", "t29_boilerplate", "q66_dsv2_source",
      "q67_weighted_mean_udaf", "s14_ann_ivfpq", "m04_frame_chunk_dedup",
      "q74_scalar_subquery", "q77_recursive_reach", "s15_ann_pq_stored",
      "s16_hybrid_rrf", "t32_bm25_topk", "st05_stream_stream_join")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"),
      jsonLine(results.toSeq.sortBy(_._1)))
    catch { case e: Throwable => System.err.println(s"[bench] full dump failed: $e") }
    println(jsonLine(headline.flatMap(h => results.get(h).map(h -> _))))
    spark.stop()
  }
}
