package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

/** Similarity-search surface over `embeddings`. The exact queries are
  * DuckDB-oracled with the SAME cosine formula (explicit
  * dot/(sqrt·sqrt) over double lists — sequential folds on both engines
  * → bit parity, then rounded to 6 for rank stability). The LSH ANN
  * variant depends on murmur3 hyperplane signs → rows-only + recall
  * measured in SimilaritySpec.
  */
object SimilarityQueries {

  private val duckCos =
    """list_dot_product(q.e, c.e) /
      |   (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef("s01_cosine_topk",
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
         |SELECT q_id, c_id, cos, CAST(rn AS INTEGER) AS rn FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    round($duckCos, 6) AS cos,
         |    row_number() OVER (PARTITION BY q.vec_id
         |                       ORDER BY round($duckCos, 6) DESC, c.vec_id) AS rn
         |  FROM v q CROSS JOIN v c
         |  WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id)
         |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") % 50 === 0, k = 5)
        .orderBy("q_id", "rn")
    },

    QueryDef("s02_neardup_pairs",
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |           FROM embeddings WHERE vec_id < 250)
         |SELECT q.vec_id AS id_a, c.vec_id AS id_b, round($duckCos, 6) AS cos
         |FROM v q JOIN v c ON q.vec_id < c.vec_id
         |ORDER BY cos DESC, id_a, id_b LIMIT 50""".stripMargin) { (s, dir) =>
      Similarity.topKPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", col("vec_id") < 250, k = 50)
    },

    // ---- per-label centroids, long form (class prototypes / drift) ----
    // The oracle derives dims from EACH ROW's vector length (zipped
    // unnests = DuckDB's posexplode), so both sides agree even on ragged
    // input: n_vecs counts vectors that actually HAVE that dimension,
    // exactly like the Spark posexplode form.
    QueryDef("s05_group_centroids",
      """SELECT label, CAST(dim AS INTEGER) AS dim,
        |  round(avg(val), 6) AS centroid, count(*) AS n_vecs
        |FROM (SELECT label, unnest(embedding) AS val,
        |        unnest(range(1, len(embedding) + 1)) AS dim
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin) { (s, dir) =>
      Similarity.groupCentroids(Tables.embeddings(s, dir),
          col("label"), col("embedding"))
        .orderBy("label", "dim")
    },

    // ---- embedding-cosine near-dup dedup: any-lower-id-neighbor rule
    //      (drop v iff SOME lower-id vector has cos ≥ 0.35 — NOT greedy
    //      survivorship; see Similarity.cosineDedup) at the corpus's
    //      ~p99.9 pair similarity, so the rule actually drops rows on
    //      this data. Oracle = NOT EXISTS over the same rounded cosine. ----
    QueryDef("s06_embedding_dedup",
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |           FROM embeddings WHERE vec_id < 250)
         |SELECT q.vec_id AS v_id FROM v q
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM v c
         |  WHERE c.vec_id < q.vec_id
         |    AND round(list_dot_product(q.e, c.e) /
         |          (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
         |        >= 0.35)
         |ORDER BY v_id""".stripMargin) { (s, dir) =>
      Similarity.cosineDedup(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") < 250, threshold = 0.35)
        .orderBy("v_id")
    },

    // murmur3-signed hyperplanes → no DuckDB form; recall vs s01 measured
    // in SimilaritySpec.
    QueryDef.noOracle("s03_ann_lsh") { (s, dir) =>
      Similarity.annTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") % 50 === 0,
          k = 5, bits = 32, bands = 4)
        .orderBy("q_id", "rn")
    },

    // IVF coarse-quantized ANN (k-means cells + nprobe search) — the
    // second scale path; deterministic but a SQL oracle would require
    // re-implementing k-means in DuckDB → rows-only. IVFSpec proves
    // nprobe == cells reduces exactly to brute force.
    QueryDef.noOracle("s04_ann_ivf") { (s, dir) =>
      graft.ext.IVF.ivfTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") % 50 === 0,
          k = 5, cells = 8, nprobe = 2)
        .orderBy("q_id", "rn")
    },

    // Cluster-scoped semantic dedup (SemDeDup shape): k-means cells bound
    // the pair space to n²/cells; same any-lower-id rule as s06's exact
    // form. k-means → no SQL oracle; SimilaritySpec pins soundness
    // (every drop justified by a lower-id cell-mate) and exact-dup recall.
    QueryDef.noOracle("s08_semantic_dedup") { (s, dir) =>
      // 0.35 sits inside the near-random corpus's top-pair cosine range
      // (~0.30-0.36) so the decision actually fires at every SF
      Similarity.clusterDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.35, cells = 8)
        .orderBy("v_id")
    },

    // Product-quantization ADC top-k (8 subspaces × 16-cell codebooks,
    // exact re-rank of the 4k shortlist) — the compressed-payload ANN
    // path; deterministic, but k-means codebooks have no SQL oracle.
    // PQSpec pins clustered-vector recall ≥0.9 and determinism.
    QueryDef.noOracle("s07_ann_pq") { (s, dir) =>
      graft.ext.PQ.adcTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") % 50 === 0,
          k = 5, m = 8, kc = 16)
        .orderBy("q_id", "rn")
    },
  )
}
