package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.ops.{Graph, Mining}

/** Pattern-mining and model-evaluation operators (round 8): market-basket
  * association rules, bitmap activity calendars with bit-parallel streak
  * detection, decile lift/gains tables, decision-tree split scoring, and
  * deterministic node2vec-style graph walks. Every query has a full DuckDB
  * hash oracle — the "random" walk included, because its randomness is
  * [[graft.ops.Prep.portableHash]], reproducible in any engine.
  */
object MiningQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- 2-itemset association rules (support / confidence / lift) over
    //      order baskets: the classic market-basket mining op. Pair space
    //      is per-basket C(b,2) — bounded by basket size (≤7 here), never
    //      corpus-quadratic; item supports broadcast onto pair rows; every
    //      ratio is one division of exact integer products. ----
    QueryDef("q123_market_basket",
      """WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
        |nb AS (SELECT count(DISTINCT g) AS n_baskets FROM b),
        |ic AS (SELECT item, count(*) AS cnt FROM b GROUP BY 1),
        |p AS (SELECT a.item AS item_a, b2.item AS item_b, count(*) AS pair_n
        |      FROM b a JOIN b b2 ON a.g = b2.g AND a.item < b2.item
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, pair_n, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
        |  CAST(pair_n AS DOUBLE) / ca.cnt AS conf_a_b,
        |  CAST(pair_n AS DOUBLE) / cb.cnt AS conf_b_a,
        |  CAST(pair_n * n_baskets AS DOUBLE) / (ca.cnt * cb.cnt) AS lift
        |FROM p JOIN ic ca ON ca.item = item_a JOIN ic cb ON cb.item = item_b
        |CROSS JOIN nb
        |ORDER BY pair_n DESC, item_a, item_b LIMIT 50""".stripMargin) { (s, dir) =>
      Mining.basketRules(
          Tables.lineitem(s, dir)
            .select(col("l_orderkey").as("g"), col("l_partkey").as("item")),
          "g", "item", minPairSupport = 2)
        .orderBy(col("pair_n").desc, col("item_a"), col("item_b"))
        .limit(50)
    },

    // ---- per-(user, month) activity calendar as a 31-bit day bitmap
    //      (bit_or of 1<<day-1) + bit_count active days + longest
    //      consecutive-day streak via gaps-and-islands. The raw events
    //      reduce once to (user, month, day) grain; all windows run on
    //      that bounded grain, partitioned per user-month. ----
    QueryDef("q124_activity_bitmap",
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(year(ts) * 100 + month(ts) AS INTEGER) AS ym,
        |    day(ts) AS d
        |  FROM events),
        |bm AS (SELECT user_id, ym,
        |         bit_or(CAST(1 AS BIGINT) << (d - 1)) AS bitmap,
        |         count(*) AS active_days
        |       FROM days GROUP BY 1, 2),
        |runs AS (SELECT user_id, ym,
        |           d - row_number() OVER (PARTITION BY user_id, ym ORDER BY d) AS isl
        |         FROM days),
        |st AS (SELECT user_id, ym, max(run) AS longest_streak FROM
        |         (SELECT user_id, ym, isl, count(*) AS run FROM runs GROUP BY 1, 2, 3)
        |       GROUP BY 1, 2)
        |SELECT bm.user_id, bm.ym, bitmap, active_days, longest_streak
        |FROM bm JOIN st ON bm.user_id = st.user_id AND bm.ym = st.ym
        |ORDER BY bm.user_id, bm.ym""".stripMargin) { (s, dir) =>
      Mining.activityBitmap(Tables.events(s, dir), "user_id", "ts")
        .withColumn("ym", col("ym").cast("int"))
        .orderBy("user_id", "ym")
    },

    // ---- decile lift/gains table: rank customers by exact decimal-summed
    //      spend, ntile(10), and per decile the response rate (placed an
    //      urgent order), cumulative responder capture, and lift vs base
    //      rate — the model-evaluation table every targeting/scoring
    //      pipeline prints. Facts pre-aggregate to customer grain before
    //      the one O(customers) ranking window — single-partition BY
    //      DESIGN (exact-oracle form, the q44 discipline); the deployment
    //      form is q155_decile_lift_bucketed, hash-graded against this
    //      SAME oracle. ----
    QueryDef("q125_decile_lift",
      """WITH sc AS (
        |  SELECT o_custkey AS id,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS responder
        |  FROM orders GROUP BY 1),
        |d AS (SELECT CAST(ntile(10) OVER (ORDER BY score DESC, id) AS INTEGER) AS decile,
        |        responder FROM sc),
        |g AS (SELECT decile, count(*) AS n_cust,
        |        CAST(sum(responder) AS BIGINT) AS responders
        |      FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(responder) AS BIGINT) AS tot_resp,
        |        count(*) AS tot_n FROM sc)
        |SELECT decile, n_cust, responders,
        |  CAST(responders AS DOUBLE) / n_cust AS resp_rate,
        |  CAST(sum(responders) OVER (ORDER BY decile) AS DOUBLE) / tot_resp AS capture,
        |  CAST(responders * tot_n AS DOUBLE) / (n_cust * tot_resp) AS lift
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin) { (s, dir) =>
      val scored = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(Exact.decimalSum(col("o_totalprice"), "score"),
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("responder"))
      Mining.decileLift(scored)
        .withColumn("decile", col("decile").cast("int"))
        .orderBy("decile")
    },

    // ---- information-gain feature ranking (Gini impurity reduction) of
    //      three categorical order features vs a binary high-value target:
    //      the decision-tree split-scoring primitive. One generator pass
    //      unpivots the features (facts touched once), contingency counts
    //      combine map-side, and the per-value impurity terms are
    //      quantized to integers before summing so the cross-value sum is
    //      merge-order-independent (Mining.giniGain scaladoc). ----
    QueryDef("q126_info_gain",
      s"""WITH o AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
         |    CAST(month(o_orderdate) AS VARCHAR) AS mon,
         |    CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pos
         |  FROM orders),
         |cont AS (
         |  SELECT 'priority' AS feature, priority AS value, count(*) AS n_v,
         |    CAST(sum(pos) AS BIGINT) AS pos_v FROM o GROUP BY 2
         |  UNION ALL SELECT 'status', status, count(*),
         |    CAST(sum(pos) AS BIGINT) FROM o GROUP BY 2
         |  UNION ALL SELECT 'month', mon, count(*),
         |    CAST(sum(pos) AS BIGINT) FROM o GROUP BY 2),
         |qq AS (SELECT feature, n_v, pos_v, ${Mining.giniTermSql} AS q FROM cont),
         |agg AS (SELECT feature, count(*) AS n_values,
         |          CAST(sum(n_v) AS BIGINT) AS n, CAST(sum(pos_v) AS BIGINT) AS pos,
         |          sum(q) AS sum_q
         |        FROM qq GROUP BY 1)
         |SELECT feature, n_values,
         |  (1.0 - CAST(pos::HUGEINT * pos + (n - pos)::HUGEINT * (n - pos)
         |           AS DOUBLE) / CAST(n::HUGEINT * n AS DOUBLE)) -
         |  (1.0 - CAST(sum_q AS DOUBLE) / CAST(n::HUGEINT * 1000000000 AS DOUBLE))
         |    AS gain
         |FROM agg ORDER BY feature""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"),
        month(col("o_orderdate")).cast("string").as("mon"),
        when(col("o_totalprice") > 150000, 1).otherwise(0).as("pos"))
      val cont = o
        .select(col("pos"),
          expr("stack(3, 'priority', priority, 'status', status, 'month', mon)")
            .as(Seq("feature", "value")))
        .groupBy(col("feature"), col("value"))
        .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("pos_v"))
      Mining.giniGain(cont).orderBy("feature")
    },

    // ---- deterministic node2vec-style walks over the part co-purchase
    //      graph: from the 20 highest-out-degree nodes, 4 hops, each hop
    //      picking the out-neighbour with minimal portableHash(walk·31 +
    //      step, dst). Walk sampling is the embedding-training data step
    //      (DeepWalk/node2vec corpus generation) — here with zero RNG, so
    //      the oracle replays the identical walks from per-step CTEs. ----
    QueryDef("q127_hash_walks",
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
         |edges AS MATERIALIZED (SELECT a.item AS src, b.item AS dst
         |          FROM li a JOIN li b ON a.g = b.g AND a.item <> b.item
         |          GROUP BY 1, 2 HAVING count(*) >= 2),
         |starts AS (SELECT src AS node FROM
         |            (SELECT src, count(*) AS deg FROM edges GROUP BY 1
         |             ORDER BY deg DESC, src LIMIT 20)),
         |w0 AS (SELECT node AS walk_id, 0 AS step, node FROM starts),
         |${Mining.walkStepSql(1)},
         |${Mining.walkStepSql(2)},
         |${Mining.walkStepSql(3)},
         |${Mining.walkStepSql(4)}
         |SELECT walk_id, step, node FROM (
         |  SELECT * FROM w0 UNION ALL SELECT * FROM w1 UNION ALL
         |  SELECT * FROM w2 UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4)
         |ORDER BY walk_id, step""".stripMargin) { (s, dir) =>
      // r16: shared memoized edge table (SharedGraph scaladoc), already
      // checkpointed — the start-node selection and all 4 hops re-scan it
      val edges = SharedGraph.coEdges(s, dir)
      val starts = edges.groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("src"))
        .limit(20)
        .select(col("src").as("node"))
      Mining.hashWalks(edges, starts, steps = 4)
        .orderBy("walk_id", "step")
    },

    // ---- calibration-bin (reliability-diagram) table: q125's sibling on
    //      the model-eval shelf. Predicted score = spend percentile
    //      rank/(N+1) — an exact rational, so the whole table is integer
    //      arithmetic until three final single divisions: bin assignment
    //      is the integer (10·rank) DIV (N+1), per-bin avg prediction is
    //      Σrank / (n·(N+1)) (no float accumulation anywhere), and the
    //      gap column is the difference of two exactly-reproducible
    //      doubles. Facts pre-aggregate to customer grain before the one
    //      O(customers) rank window — single-partition BY DESIGN
    //      (exact-oracle form); the deployment form is
    //      q156_calibration_bins_bucketed against this SAME oracle. ----
    QueryDef("q128_calibration_bins",
      """WITH sc AS (
        |  SELECT o_custkey AS id,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS responder
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM sc),
        |r AS (SELECT id, responder,
        |        row_number() OVER (ORDER BY score, id) AS rank FROM sc),
        |b AS (SELECT CAST((10 * rank) // (n + 1) AS INTEGER) AS bin,
        |        rank, responder, n FROM r CROSS JOIN nn)
        |SELECT bin, count(*) AS n_cust,
        |  CAST(sum(responder) AS BIGINT) AS responders,
        |  CAST(sum(rank) AS DOUBLE) / (count(*) * (max(n) + 1)) AS pred_avg,
        |  CAST(sum(responder) AS DOUBLE) / count(*) AS actual_rate,
        |  CAST(sum(rank) AS DOUBLE) / (count(*) * (max(n) + 1)) -
        |    CAST(sum(responder) AS DOUBLE) / count(*) AS gap
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      val scored = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(Exact.decimalSum(col("o_totalprice"), "score"),
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("responder"))
      Mining.calibrationBins(scored).orderBy("bin")
    },

    // ---- q125's AT-SCALE twin, graded against the IDENTICAL oracle: the
    //      single-task ntile sort becomes Prep.rankViaBuckets (sketch-edge
    //      buckets → partitioned intra-bucket rank → driver-side B-entry
    //      prefix map) + the closed-form ntile inverse, and the 10-row
    //      cumulative window becomes a broadcast triangle join — the plan
    //      has NO window at all (PlanSpec census). Twin discipline: q44→
    //      q45, except here the bucketed form is EXACT, so it hash-grades
    //      against the same SQL instead of rows-only. ----
    QueryDef("q155_decile_lift_bucketed",
      """WITH sc AS (
        |  SELECT o_custkey AS id,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS responder
        |  FROM orders GROUP BY 1),
        |d AS (SELECT CAST(ntile(10) OVER (ORDER BY score DESC, id) AS INTEGER) AS decile,
        |        responder FROM sc),
        |g AS (SELECT decile, count(*) AS n_cust,
        |        CAST(sum(responder) AS BIGINT) AS responders
        |      FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(responder) AS BIGINT) AS tot_resp,
        |        count(*) AS tot_n FROM sc)
        |SELECT decile, n_cust, responders,
        |  CAST(responders AS DOUBLE) / n_cust AS resp_rate,
        |  CAST(sum(responders) OVER (ORDER BY decile) AS DOUBLE) / tot_resp AS capture,
        |  CAST(responders * tot_n AS DOUBLE) / (n_cust * tot_resp) AS lift
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin) { (s, dir) =>
      val scored = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(Exact.decimalSum(col("o_totalprice"), "score"),
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("responder"))
      Mining.decileLiftBucketed(scored)
        .withColumn("decile", col("decile").cast("int"))
        .orderBy("decile")
    },

    // ---- q128's AT-SCALE twin, graded against the IDENTICAL oracle: the
    //      one global rank window swaps for Prep.rankViaBuckets; the
    //      integer-exact binning/aggregate tail is SHARED with q128
    //      (Mining.calibrationFromRanked), so the outputs are
    //      bit-identical by construction. ----
    QueryDef("q156_calibration_bins_bucketed",
      """WITH sc AS (
        |  SELECT o_custkey AS id,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS responder
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM sc),
        |r AS (SELECT id, responder,
        |        row_number() OVER (ORDER BY score, id) AS rank FROM sc),
        |b AS (SELECT CAST((10 * rank) // (n + 1) AS INTEGER) AS bin,
        |        rank, responder, n FROM r CROSS JOIN nn)
        |SELECT bin, count(*) AS n_cust,
        |  CAST(sum(responder) AS BIGINT) AS responders,
        |  CAST(sum(rank) AS DOUBLE) / (count(*) * (max(n) + 1)) AS pred_avg,
        |  CAST(sum(responder) AS DOUBLE) / count(*) AS actual_rate,
        |  CAST(sum(rank) AS DOUBLE) / (count(*) * (max(n) + 1)) -
        |    CAST(sum(responder) AS DOUBLE) / count(*) AS gap
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      val scored = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(Exact.decimalSum(col("o_totalprice"), "score"),
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("responder"))
      Mining.calibrationBinsBucketed(scored).orderBy("bin")
    },

    // ---- count-min sketch heavy hitters: build the fixed-size (4×1024)
    //      CMS over part popularity, point-query every key (est = min of
    //      its 4 cells), and report the top-20 by estimate NEXT TO the
    //      exact counts — overshoot = est − exact ≥ 0 is the CMS
    //      guarantee, visible per row. The sketch is 4096 integers no
    //      matter the input size and merges cell-wise across partitions/
    //      days — the streaming-and-distributed counting primitive
    //      (Cormode & Muthukrishnan 2005). portableHash on both sides →
    //      every cell and every estimate re-derives exactly in DuckDB. ----
    QueryDef("q141_cms_heavy_hitters", {
      def h(a: String, b: String) = graft.ops.Prep.portableHashSql(a, b)
      s"""WITH r AS (SELECT l_partkey AS k FROM lineitem),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |cells AS (SELECT js.j, ${h("js.j", "r.k")} % 1024 AS bucket,
         |    count(*) AS c
         |  FROM r CROSS JOIN js GROUP BY 1, 2),
         |keys AS (SELECT DISTINCT k FROM r),
         |est AS (SELECT keys.k, min(c.c) AS est
         |  FROM keys CROSS JOIN js
         |  JOIN cells c ON c.j = js.j
         |    AND c.bucket = ${h("js.j", "keys.k")} % 1024
         |  GROUP BY 1),
         |ex AS (SELECT k, count(*) AS exact_count FROM r GROUP BY 1)
         |SELECT est.k AS part_key,
         |  CAST(ex.exact_count AS BIGINT) AS exact_count,
         |  CAST(est.est AS BIGINT) AS est_count,
         |  CAST(est.est - ex.exact_count AS BIGINT) AS overshoot
         |FROM est JOIN ex ON ex.k = est.k
         |ORDER BY est_count DESC, part_key LIMIT 20""".stripMargin
    }) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_partkey").as("k"))
      val counters = Mining.cmsCounters(li, col("k"))
      val exact = li.groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
      Mining.cmsEstimates(counters, li)
        .join(exact, "k")
        .select(col("k").as("part_key"), col("exact_count"),
          col("est").as("est_count"),
          (col("est") - col("exact_count")).as("overshoot"))
        .orderBy(col("est_count").desc, col("part_key")).limit(20)
    },
  )
}
