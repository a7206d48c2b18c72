package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Maintenance, Skew}
import Parity._

/** Production-pipeline maintenance + robustness operators: skew-salted
  * joins, MERGE-style upsert, SCD2 history, changelog compaction,
  * deterministic median/mode, and ordered string aggregation.
  *
  * Every query here is fully DuckDB-oracled — the operators are all
  * rewrites whose OUTPUT equals a plain ANSI-SQL formulation (that is the
  * point: salting/merge staging change the execution shape, never the
  * result).
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- skew-mitigated join: events (skewed user_id fan-out) joined to
    //      customer through Skew.saltedJoin — the hot key is spread over 8
    //      salt buckets, the dimension replicated per salt. Result is
    //      IDENTICAL to the plain join (the oracle), which is exactly what
    //      makes salting safe to drop into a hot pipeline. ----
    QueryDef("q46_salted_skew_join",
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("user_id").as("cust"), col("value"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("cust"), col("c_mktsegment"))
      Skew.saltedJoin(ev, cust, "cust", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), decimalSum(col("value"), "sum_value"))
        .orderBy("c_mktsegment")
    },

    // ---- MERGE-style upsert (SCD1): open orders get re-prioritized
    //      (matched → replace), and a synthetic late-arriving batch with
    //      shifted keys lands as inserts (not matched → insert). ----
    QueryDef("q47_merge_upsert",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  CASE WHEN o_orderstatus = 'O' THEN '1-URGENT' ELSE o_orderpriority END
        |    AS o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT -(o_orderkey + 1) AS o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice, '9-NEW' AS o_orderpriority
        |FROM orders WHERE o_orderkey % 1000 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val target = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      val reprioritized = target.filter(col("o_orderstatus") === "O")
        .withColumn("o_orderpriority", lit("1-URGENT"))
      // synthetic insert keys are the NEGATED key space (-(k+1)) — disjoint
      // from the non-negative real keys at EVERY scale factor, unlike any
      // fixed additive offset a dense keyspace eventually reaches
      val lateBatch = target.filter(col("o_orderkey") % 1000 === 0)
        .withColumn("o_orderkey", -(col("o_orderkey") + 1L))
        .withColumn("o_orderpriority", lit("9-NEW"))
      Maintenance.upsert(target, reprioritized.unionByName(lateBatch),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ---- full CDC apply (q47 + deletes): every 100th order is a D,
    //      every (100k+1)th a U (price bump), negated-key inserts — one
    //      anti-join on the touched-key set + union, deletes free. ----
    QueryDef("q70_cdc_apply",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 100 NOT IN (0, 1)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1.5
        |  FROM orders WHERE o_orderkey % 100 = 1
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey % 1000 = 500)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val target = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val deletes = target.filter(col("o_orderkey") % 100 === 0)
        .withColumn("op", lit("D"))
      val updates = target.filter(col("o_orderkey") % 100 === 1)
        .withColumn("o_totalprice", col("o_totalprice") + 1.5)
        .withColumn("op", lit("U"))
      val inserts = target.filter(col("o_orderkey") % 1000 === 500)
        .withColumn("o_orderkey", -(col("o_orderkey") + 1L))
        .withColumn("op", lit("I"))
      Maintenance.applyCdc(target,
          deletes.unionByName(updates).unionByName(inserts), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ---- SCD2: per-customer order history as validity intervals ----
    QueryDef("q48_scd2_history",
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END
        |       AS INTEGER) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin) { (s, dir) =>
      Maintenance.scd2(Tables.orders(s, dir),
          Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          dayStr(col("valid_from")).as("valid_from"),
          dayStr(col("valid_to")).as("valid_to"),
          col("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },

    // ---- changelog compaction: latest event per user (CDC read path) ----
    QueryDef("q49_latest_per_key",
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      Maintenance.latestPerKey(Tables.events(s, dir),
          Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), tsStr(col("ts")).as("ts"),
          col("event_type"), col("value"))
        .orderBy("user_id")
    },

    // ---- exact median + deterministic mode per group. Spark's built-in
    //      `mode` breaks count ties arbitrarily (engine-dependent), so the
    //      mode here is argmax-by-(count desc, value asc) via a ranked
    //      window over the (group, value) count table — deterministic on
    //      both engines. ----
    QueryDef("q50_median_mode",
      """WITH m AS (SELECT event_type, count(*) AS n,
        |             round(quantile_cont(value, 0.5), 4) AS median_value
        |           FROM events GROUP BY 1),
        |c AS (SELECT event_type, value, count(*) AS cnt FROM events GROUP BY 1, 2),
        |md AS (SELECT event_type, value AS mode_value, cnt AS mode_count
        |       FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |               ORDER BY cnt DESC, value) AS rn FROM c)
        |       WHERE rn = 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n, median_value,
        |  mode_value, CAST(mode_count AS BIGINT) AS mode_count
        |FROM m JOIN md USING (event_type) ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("median_value"))
      val c = ev.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"))
      // asc_nulls_last: DuckDB's default ORDER BY is NULLS LAST, Spark's
      // asc is NULLS FIRST — a NULL value group tying for the max count
      // would otherwise break the tie differently per engine
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("value").asc_nulls_last)
      val md = c.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("value").as("mode_value"),
          col("cnt").as("mode_count"))
      m.join(md, "event_type")
        .select(col("event_type"), col("n"), col("median_value"),
          col("mode_value"), col("mode_count"))
        .orderBy("event_type")
    },

    // ---- ordered string aggregation: high-balance customer names per
    //      segment, sorted then joined — collect_list alone is partition-
    //      order-nondeterministic, array_sort makes it reproducible (the
    //      same trick any LLM-prompt assembly over grouped rows needs) ----
    QueryDef("q51_string_agg",
      """SELECT c_mktsegment,
        |  CAST(count(*) FILTER (WHERE c_acctbal > 9000) AS BIGINT) AS n_vip,
        |  coalesce(string_agg(c_name, ',' ORDER BY c_name)
        |             FILTER (WHERE c_acctbal > 9000), '') AS vip_names
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val vip = when(col("c_acctbal") > 9000, col("c_name"))
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(count(vip).as("n_vip"),
          array_join(array_sort(collect_list(vip)), ",").as("vip_names"))
        .orderBy("c_mktsegment")
    },

    // ---- population stability index: per-event-type value distribution
    //      vs the overall corpus over fixed-width bins (q27's buckets).
    //      PSI = Σ (p−q)·ln(p/q); cells empty on either side are skipped
    //      (the bounded standard practice — ε-smoothing changes the number,
    //      skipping changes it less and stays engine-exact). Everything
    //      derives from ONE (event_type, bucket) count table: the same
    //      shape as q43's KL, which is the divergence this monitoring
    //      metric symmetrizes. ----
    QueryDef("q52_psi_drift",
      """WITH eb AS (SELECT event_type, CAST(floor(value / 25.0) AS INTEGER) AS bucket,
        |              count(*) AS c
        |            FROM events GROUP BY 1, 2),
        |et AS (SELECT event_type, sum(c) AS n FROM eb GROUP BY 1),
        |gb AS (SELECT bucket, sum(c) AS gc FROM eb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM eb)
        |SELECT event_type, CAST(et.n AS BIGINT) AS n_events,
        |  round(sum((CAST(c AS DOUBLE)/et.n - CAST(gc AS DOUBLE)/tot.n)
        |        * ln((CAST(c AS DOUBLE)/et.n) / (CAST(gc AS DOUBLE)/tot.n))), 6) AS psi
        |FROM eb JOIN et USING (event_type) JOIN gb USING (bucket) CROSS JOIN tot
        |GROUP BY event_type, et.n ORDER BY event_type""".stripMargin) { (s, dir) =>
      // same shape as q43: the count table feeds four consumers —
      // materialize once instead of four fact scans
      val eb = Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("value") / 25.0).cast("int").as("bucket"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val et = eb.groupBy("event_type").agg(sum(col("c")).as("n"))
      val gb = eb.groupBy("bucket").agg(sum(col("c")).as("gc"))
      val tot = eb.agg(sum(col("c")).as("tot"))
      val p = col("c").cast("double") / col("n")
      val q = col("gc").cast("double") / col("tot")
      eb.join(et, "event_type").join(gb, "bucket")
        .crossJoin(broadcast(tot))
        .groupBy(col("event_type"), col("n"))
        .agg(round(sum((p - q) * log(p / q)), 6).as("psi"))
        .select(col("event_type"), col("n").as("n_events"), col("psi"))
        .orderBy("event_type")
    },

    // ---- stratified sampling: per-stratum deterministic rates via key
    //      modulus (high-volume strata downsampled hard, rare strata kept
    //      whole — the class-rebalancing read any training pipeline runs).
    //      Map-side only: no shuffle, no rand() (engine-specific), fully
    //      reproducible. ----
    QueryDef("q53_stratified_sample",
      """SELECT event_id, event_type, user_id, value
        |FROM events
        |WHERE CASE WHEN event_type = 'view'  THEN event_id % 20 = 0
        |           WHEN event_type = 'click' THEN event_id % 10 = 0
        |           ELSE true END
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(
          when(col("event_type") === "view", col("event_id") % 20 === 0)
            .when(col("event_type") === "click", col("event_id") % 10 === 0)
            .otherwise(lit(true)))
        .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
        .orderBy("event_id")
    },

    // ---- incremental aggregation: a pre-aggregated state (orders before
    //      the cutoff) merges with a delta batch's partials into totals
    //      IDENTICAL to a full rescan (the oracle aggregates everything
    //      from scratch). This is the pattern that replaces full-table
    //      re-aggregation at 100 TB: partials are mergeable because the
    //      sums stay DECIMAL until the final cast (addition exact,
    //      order-independent) and counts are longs — never merge rounded
    //      doubles. ----
    QueryDef("q54_incremental_agg",
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderpriority")
          .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("s"),
               count(lit(1)).as("n"))
      val state = partial(o.filter(col("o_orderdate") < "1997-06-01"))
      val delta = partial(o.filter(col("o_orderdate") >= "1997-06-01"))
      state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(sum(col("s")).cast("double").as("revenue"),
             sum(col("n")).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // ---- point-in-time feature backfill: for each purchase event, the
    //      user's click/view count and exact value sum over the PRIOR
    //      hour — the leakage-safe feature join a training pipeline runs
    //      (features strictly from before the label event's timestamp).
    //      Uses the banded interval join (equi-join on (key, time-bin) +
    //      exact range filter), never a raw range nested loop. ----
    QueryDef("q55_feature_backfill",
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
        |  CAST(count(b.ts) AS BIGINT) AS n_prior_1h,
        |  CAST(coalesce(sum(CAST(b.value AS DECIMAL(18,6))), 0) AS DOUBLE)
        |    AS sum_value_1h
        |FROM events p LEFT JOIN events b
        |  ON b.user_id = p.user_id
        | AND b.event_type IN ('click', 'view')
        | AND b.ts >= p.ts - INTERVAL 1 HOUR AND b.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      val activity = ev.filter(col("event_type").isin("click", "view"))
      graft.ops.TimeSeries.aggInWindow(
          purchases, col("user_id"), col("ts"), col("event_id"),
          activity, col("user_id"), col("ts"), col("value"),
          windowSec = 3600L)
        .withColumnRenamed("n_matches", "n_prior_1h")
        .withColumnRenamed("sum_value", "sum_value_1h")
        .join(purchases.select(col("event_id").as("p_id"), col("user_id"),
          tsStr(col("ts")).as("label_ts")), "p_id")
        .select(col("p_id").as("event_id"), col("user_id"), col("label_ts"),
          col("n_prior_1h"), col("sum_value_1h"))
        .orderBy("event_id")
    },

    // ---- data-quality constraint audit: one row per declared rule with
    //      its violation count — the expectation-suite check a pipeline
    //      runs before promoting a batch. ONE aggregate pass computes all
    //      rule counters as conditional sums (map-side combine, shuffle
    //      volume = one row), then `stack` unpivots the single row to
    //      rule-per-row. Adding a rule adds a column to the same scan,
    //      never another pass — that is what keeps an expectation suite
    //      affordable at 100 TB. ----
    QueryDef("q56_constraint_audit",
      """WITH a AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN value < 0 OR value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS value_out_of_range,
        |  CAST(sum(CASE WHEN event_type NOT IN ('view','click','purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS unknown_event_type,
        |  CAST(sum(CASE WHEN user_id IS NULL OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_required_field,
        |  CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
        |            OR json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_k_out_of_range
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'null_required_field' AS rule, null_required_field AS n_violations, n_rows FROM a
        |  UNION ALL SELECT 'props_k_out_of_range', props_k_out_of_range, n_rows FROM a
        |  UNION ALL SELECT 'unknown_event_type', unknown_event_type, n_rows FROM a
        |  UNION ALL SELECT 'value_out_of_range', value_out_of_range, n_rows FROM a)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      def viol(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      Tables.events(s, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          viol(col("value") < 0 || col("value") > 400).as("r1"),
          viol(!col("event_type").isin("view", "click", "purchase", "signup")).as("r2"),
          viol(col("user_id").isNull || col("value").isNull).as("r3"),
          viol(get_json_object(col("props"), "$.k").cast("int") > 90
            || get_json_object(col("props"), "$.k").isNull).as("r4"))
        .selectExpr(
          """stack(4,
            |  'value_out_of_range', r1,
            |  'unknown_event_type', r2,
            |  'null_required_field', r3,
            |  'props_k_out_of_range', r4) AS (rule, n_violations)""".stripMargin,
          "n_rows")
        .orderBy("rule")
    },

    // ---- winsorized robust statistics: per-group p05/p95 clamp, then
    //      mean/stddev of the clamped values — the outlier-robust KPI a
    //      monitoring pipeline prefers over raw means. Bounds come from
    //      one exact-percentile aggregate (5 rows) broadcast back onto
    //      the fact; at 100 TB the exact percentile becomes
    //      approx_percentile exactly as q44→q45 swaps (same plan shape,
    //      sketch instead of sort). ----
    QueryDef("q57_winsorized_stats",
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(min(b.lo), 6) AS p05, round(min(b.hi), 6) AS p95,
        |  round(avg(least(greatest(e.value, b.lo), b.hi)), 6) AS avg_winsorized,
        |  round(stddev_samp(least(greatest(e.value, b.lo), b.hi)), 6) AS sd_winsorized
        |FROM events e JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val bounds = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("lo"),
             expr("percentile(value, 0.95)").as("hi"))
      val w = least(greatest(col("value"), col("lo")), col("hi"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(min(col("lo")), 6).as("p05"), round(min(col("hi")), 6).as("p95"),
          round(avg(w), 6).as("avg_winsorized"),
          round(stddev_samp(w), 6).as("sd_winsorized"))
        .orderBy("event_type")
    },

    // ---- MAD robust outliers: per-group median, median-absolute-
    //      deviation, and the |x − med| > 4.4478·MAD count (4.4478 =
    //      3·1.4826, the normal-consistency constant, written as ONE
    //      literal so both engines form the identical threshold double).
    //      The breakdown-point-0.5 sibling of q57's winsorizing and
    //      q04's stddev z-scores — the robust anomaly gate monitoring
    //      pipelines prefer when outliers pollute the stddev itself. Two
    //      exact-percentile aggregates (group-sized, broadcast back) +
    //      one counting pass; at 100 TB both swap to approx_percentile
    //      exactly as q44→q45. Interpolated medians are bit-identical
    //      across engines (same type-7 lo+(hi−lo)·frac formula — the q57
    //      precedent), so the strict-> comparison needs no tolerance. ----
    QueryDef("q143_mad_outliers",
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, round(min(d.med), 6) AS med,
        |  round(min(md.mad), 6) AS mad,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN d.adev > 4.4478 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN d.adev > 4.4478 * md.mad THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS outlier_rate
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      val isOut = col("adev") > lit(4.4478) * col("mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(round(min(col("med")), 6).as("med"),
          round(min(col("mad")), 6).as("mad"),
          count(lit(1)).as("n"),
          sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
          round(sum(when(isOut, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6).as("outlier_rate"))
        .orderBy("event_type")
    },

    // ---- change-data-feed GENERATION (q104's row-level inverse): diff
    //      the same two snapshots into the Delta-CDF/Debezium changelog —
    //      +I with new values, -D with old, a -U/+U pair per changed key.
    //      Applying this log to A rebuilds B (the applyCdc inverse). ONE
    //      full-outer join; each surviving row explodes into its 1-2
    //      events map-side — never four filtered re-executions of the
    //      join, which is what the UNION-of-legs oracle formulation
    //      plans (fine for DuckDB, wrong at 100 TB). ----
    QueryDef("q148_changelog_gen",
      """WITH a AS (SELECT * FROM orders),
        |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 100.0
        |             ELSE o_totalprice END AS o_totalprice,
        |        o_orderdate,
        |        CASE WHEN o_orderkey % 97 = 0 THEN '3-MEDIUM'
        |             ELSE o_orderpriority END AS o_orderpriority
        |      FROM orders WHERE o_orderkey % 101 <> 0
        |      UNION ALL
        |      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |        o_totalprice, o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 103 = 0),
        |chg AS (SELECT a.o_orderkey,
        |    a.o_custkey AS a_cust, a.o_orderstatus AS a_status,
        |    a.o_totalprice AS a_price, a.o_orderdate AS a_date,
        |    a.o_orderpriority AS a_prio,
        |    b.o_custkey AS b_cust, b.o_orderstatus AS b_status,
        |    b.o_totalprice AS b_price, b.o_orderdate AS b_date,
        |    b.o_orderpriority AS b_prio
        |  FROM a JOIN b USING (o_orderkey)
        |  WHERE a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |     OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
        |     OR a.o_custkey IS DISTINCT FROM b.o_custkey
        |     OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |     OR a.o_orderdate IS DISTINCT FROM b.o_orderdate)
        |SELECT * FROM (
        |  SELECT '+I' AS op, b.o_orderkey, b.o_custkey, b.o_orderstatus,
        |    b.o_totalprice, strftime(b.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |    b.o_orderpriority
        |  FROM b WHERE NOT EXISTS
        |    (SELECT 1 FROM a WHERE a.o_orderkey = b.o_orderkey)
        |  UNION ALL
        |  SELECT '-D', a.o_orderkey, a.o_custkey, a.o_orderstatus,
        |    a.o_totalprice, strftime(a.o_orderdate, '%Y-%m-%d'),
        |    a.o_orderpriority
        |  FROM a WHERE NOT EXISTS
        |    (SELECT 1 FROM b WHERE b.o_orderkey = a.o_orderkey)
        |  UNION ALL
        |  SELECT '-U', o_orderkey, a_cust, a_status, a_price,
        |    strftime(a_date, '%Y-%m-%d'), a_prio FROM chg
        |  UNION ALL
        |  SELECT '+U', o_orderkey, b_cust, b_status, b_price,
        |    strftime(b_date, '%Y-%m-%d'), b_prio FROM chg)
        |ORDER BY o_orderkey, op""".stripMargin) { (s, dir) =>
      val a = Tables.orders(s, dir)
      val mut = col("o_orderkey") % 97 === 0
      val b = a.filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_totalprice",
          when(mut, col("o_totalprice") + 100.0).otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(mut, lit("3-MEDIUM")).otherwise(col("o_orderpriority")))
        .unionByName(a.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      Maintenance.changelogDiff(a, b, Seq("o_orderkey"))
        .withColumn("o_orderdate", dayStr(col("o_orderdate")))
        .orderBy("o_orderkey", "op")
    },

    // ---- compaction (OPTIMIZE) planner: pack a small-file inventory
    //      into ~2 MiB rewrite bins per table partition — greedy
    //      size-descending sequential packing via ONE cumulative-sum
    //      window (bin = bytes-before DIV target), the Delta/Iceberg
    //      OPTIMIZE planning shape. The inventory is derived
    //      deterministically from lineitem (file = orderkey%40 within
    //      returnflag, bytes = 128·rows) so both engines plan the same
    //      files; planning is metadata-sized — one row per FILE — and
    //      never touches data bytes. ----
    QueryDef("q144_compaction_plan",
      """WITH inv AS (SELECT l_returnflag AS part,
        |    l_orderkey % 40 AS file_id, count(*) * 128 AS bytes
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT part, bytes,
        |    COALESCE(sum(bytes) OVER (PARTITION BY part
        |      ORDER BY bytes DESC, file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bfr
        |  FROM inv)
        |SELECT part, CAST(bfr // 2097152 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes
        |FROM c GROUP BY 1, 2 ORDER BY part, bin""".stripMargin) { (s, dir) =>
      val inv = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("part"),
          (col("l_orderkey") % 40).as("file_id"))
        .agg((count(lit(1)) * 128).as("bytes"))
      Maintenance.compactionPlan(inv, targetBytes = 2097152L)
        .orderBy("part", "bin")
    },

    // ---- join-key skew profile: per candidate join key, distinct-key
    //      count, hottest key + count, max/mean skew ratio, and the Gini
    //      coefficient of the key-frequency distribution — the pre-join
    //      diagnostic that picks plain shuffle vs q46's salted join vs
    //      AQE skew splitting BEFORE the straggler task appears. One
    //      stack pass over the facts, count tables combine map-side, the
    //      rank window runs over DISTINCT keys only; Gini is exact
    //      integer arithmetic until the final division. ----
    QueryDef("q145_skew_profile",
      """WITH keyed AS (
        |  SELECT 'l_orderkey' AS col_name, l_orderkey AS k FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
        |cnt AS (SELECT col_name, k, count(*) AS c FROM keyed GROUP BY 1, 2),
        |r AS (SELECT col_name, k, c,
        |    row_number() OVER (PARTITION BY col_name ORDER BY c, k) AS i,
        |    row_number() OVER (PARTITION BY col_name ORDER BY c DESC, k) AS rd
        |  FROM cnt)
        |SELECT col_name, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(max(c) AS BIGINT) AS max_count,
        |  CAST(max(CASE WHEN rd = 1 THEN k END) AS BIGINT) AS top_key,
        |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS skew_ratio,
        |  round(CAST(2 * sum(i * c) - (count(*) + 1) * sum(c) AS DOUBLE) /
        |    (count(*) * sum(c)), 6) AS gini
        |FROM r GROUP BY 1 ORDER BY col_name""".stripMargin) { (s, dir) =>
      val keyed = Tables.lineitem(s, dir).select(expr(
        """stack(3, 'l_orderkey', l_orderkey,
          |  'l_partkey', l_partkey,
          |  'l_suppkey', l_suppkey) AS (col_name, k)""".stripMargin))
      Maintenance.keySkewProfile(keyed).orderBy("col_name")
    },

    // ---- snapshot data-diff (the pre-promotion audit): classify a
    //      rebuilt snapshot against the current one — added / removed /
    //      changed / unchanged + per-column change counts — via
    //      Maintenance.snapshotDiff's single co-partitioned full-outer
    //      join. The B snapshot is DERIVED deterministically (key%97
    //      price+priority mutation, key%101 deletion, key%103 insertion
    //      at offset ids) so both engines diff the same pair. ----
    QueryDef("q104_snapshot_diff",
      """WITH a AS (SELECT * FROM orders),
        |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 100.0
        |             ELSE o_totalprice END AS o_totalprice,
        |        o_orderdate,
        |        CASE WHEN o_orderkey % 97 = 0 THEN '3-MEDIUM'
        |             ELSE o_orderpriority END AS o_orderpriority
        |      FROM orders WHERE o_orderkey % 101 <> 0
        |      UNION ALL
        |      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |        o_totalprice, o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 103 = 0),
        |j AS (SELECT
        |    a.o_orderkey IS NOT NULL AS in_a, b.o_orderkey IS NOT NULL AS in_b,
        |    NOT (a.o_custkey IS NOT DISTINCT FROM b.o_custkey) AS c_cust,
        |    NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus) AS c_status,
        |    NOT (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice) AS c_price,
        |    NOT (a.o_orderdate IS NOT DISTINCT FROM b.o_orderdate) AS c_date,
        |    NOT (a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority) AS c_prio
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
        |s AS (SELECT CASE WHEN NOT in_a THEN 'added'
        |        WHEN NOT in_b THEN 'removed'
        |        WHEN c_cust OR c_status OR c_price OR c_date OR c_prio
        |          THEN 'changed' ELSE 'unchanged' END AS status,
        |        c_price, c_prio
        |      FROM j)
        |SELECT status, count(*) AS n,
        |  count(CASE WHEN status = 'changed' AND c_price THEN 1 END) AS n_price_chg,
        |  count(CASE WHEN status = 'changed' AND c_prio THEN 1 END) AS n_priority_chg
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val a = Tables.orders(s, dir)
      val mut = col("o_orderkey") % 97 === 0
      val b = a.filter(col("o_orderkey") % 101 =!= 0)
        .withColumn("o_totalprice",
          when(mut, col("o_totalprice") + 100.0).otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(mut, lit("3-MEDIUM")).otherwise(col("o_orderpriority")))
        .unionByName(a.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      Maintenance.snapshotDiff(a, b, Seq("o_orderkey"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          count(when(col("status") === "changed" && col("chg_o_totalprice"), 1))
            .as("n_price_chg"),
          count(when(col("status") === "changed" && col("chg_o_orderpriority"), 1))
            .as("n_priority_chg"))
        .orderBy("status")
    },

    // ---- weighted median (the prep twin of q50's plain median): the
    //      smallest value whose cumulative weight reaches half the total
    //      — revenue-weighted "typical quantity" per return flag. Weights
    //      collapse to per-value DECIMAL sums first, so the running
    //      cumulative and the total are exact and the >= threshold test
    //      compares identical doubles in both engines. One keyed window
    //      over distinct values — never a per-row global sort. ----
    QueryDef("q108_weighted_median",
      """WITH w AS (SELECT l_returnflag AS flag, l_quantity AS v,
        |             CAST(l_extendedprice AS DECIMAL(18,6)) AS wt
        |           FROM lineitem),
        |g AS (SELECT flag, v, sum(wt) AS wv FROM w GROUP BY 1, 2),
        |cum AS (SELECT flag, v,
        |    sum(wv) OVER (PARTITION BY flag ORDER BY v) AS cw,
        |    sum(wv) OVER (PARTITION BY flag) AS tw
        |  FROM g),
        |pick AS (SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS rn
        |  FROM cum WHERE CAST(cw AS DOUBLE) >= CAST(tw AS DOUBLE) / 2.0)
        |SELECT flag AS l_returnflag, v AS weighted_median
        |FROM pick WHERE rn = 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val g = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_quantity").as("v"),
          col("l_extendedprice").cast("decimal(18,6)").as("wt"))
        .groupBy("flag", "v").agg(sum(col("wt")).as("wv"))
      val wCum = Window.partitionBy("flag").orderBy("v")
      val wTot = Window.partitionBy("flag")
      val wPick = Window.partitionBy("flag").orderBy("v")
      g.withColumn("cw", sum(col("wv")).over(wCum))
        .withColumn("tw", sum(col("wv")).over(wTot))
        .filter(col("cw").cast("double") >= col("tw").cast("double") / 2.0)
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("flag").as("l_returnflag"), col("v").as("weighted_median"))
        .orderBy("l_returnflag")
    },

    // ---- functional-dependency audit (the Tane/Metanome profiling
    //      primitive, run as a check): for each CANDIDATE dependency
    //      X → Y, how many X-groups see more than one Y? q56 audits
    //      single-ROW rules; this is the cross-row class — schema drift
    //      (a "should-be-determined" attribute going multivalued) shows
    //      up here first. Each FD is one count-distinct aggregate on the
    //      LHS grain + a one-row rollup; legs union at the summary
    //      level, so adding a candidate FD adds one aggregate, never a
    //      join. ----
    QueryDef("q119_fd_audit",
      s"""WITH f1 AS (SELECT l_orderkey AS k, count(DISTINCT l_returnflag) AS ndv
         |            FROM lineitem GROUP BY 1),
         |f2 AS (SELECT l_partkey AS k, count(DISTINCT l_suppkey) AS ndv
         |       FROM lineitem GROUP BY 1),
         |s1 AS (SELECT 'l_orderkey->l_returnflag' AS fd,
         |         count(*) AS n_groups,
         |         CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_violating
         |       FROM f1),
         |s2 AS (SELECT 'l_partkey->l_suppkey', count(*),
         |         CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |       FROM f2),
         |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         |SELECT fd, n_groups, n_violating,
         |  ${graft.ops.Prep.floorToSql(
               "CAST(n_violating AS DOUBLE) / n_groups", 6)} AS violation_ratio
         |FROM u ORDER BY fd""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      def leg(name: String, lhs: String, rhs: String) =
        li.groupBy(col(lhs).as("k"))
          .agg(countDistinct(col(rhs)).as("ndv"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(name).as("fd"), col("n_groups"), col("n_violating"))
      leg("l_orderkey->l_returnflag", "l_orderkey", "l_returnflag")
        .unionByName(leg("l_partkey->l_suppkey", "l_partkey", "l_suppkey"))
        .withColumn("violation_ratio", graft.ops.Prep.floorTo(
          col("n_violating").cast("double") / col("n_groups"), 6))
        .orderBy("fd")
    },

    // ---- dimension coverage / referential-integrity audit: for each
    //      dimension←fact FK, how many dim rows are actually referenced,
    //      how many fact keys are orphans (missing from the dim), and the
    //      coverage ratio — the data-ops report next to q119's FDs and
    //      q56's row rules. Each leg is one distinct-reduce of the fact
    //      key + two semi/anti joins against the dim key (broadcast-sized
    //      key sets); adding an FK adds a leg, never a rescan of another
    //      fact. The orphan leg uses NOT EXISTS (not NOT IN) so the
    //      oracle matches left_anti's null semantics: a NULL fact key
    //      counts as an orphan and a NULL dim key can't veto the whole
    //      set — latent-proofing against nullable keys. ----
    QueryDef("q135_dim_coverage", {
      def leg(name: String, dim: String, dk: String, fact: String,
              fk: String): String =
        s"""SELECT '$name' AS fk, (SELECT count(*) FROM $dim) AS n_dim,
           |  (SELECT count(*) FROM (SELECT DISTINCT $dk FROM $dim
           |     WHERE $dk IN (SELECT $fk FROM $fact))) AS n_referenced,
           |  (SELECT count(*) FROM (SELECT DISTINCT $fk FROM $fact f
           |     WHERE NOT EXISTS (SELECT 1 FROM $dim d
           |       WHERE d.$dk = f.$fk))) AS n_orphan_keys,
           |  CAST((SELECT count(*) FROM (SELECT DISTINCT $dk FROM $dim
           |     WHERE $dk IN (SELECT $fk FROM $fact))) AS DOUBLE)
           |    / (SELECT count(*) FROM $dim) AS coverage
           |FROM (VALUES (1)) t(x)""".stripMargin
      Seq(
        leg("orders.o_custkey->customer", "customer", "c_custkey", "orders", "o_custkey"),
        leg("lineitem.l_orderkey->orders", "orders", "o_orderkey", "lineitem", "l_orderkey"),
        leg("lineitem.l_partkey->part", "part", "p_partkey", "lineitem", "l_partkey"),
        leg("lineitem.l_suppkey->supplier", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    }) { (s, dir) =>
      // ONE full-outer join + ONE aggregate per leg (r15; guide §2.4) —
      // the previous shape (checkpointed key set + separate semi-join,
      // anti-join and dim-count subtrees cross-joined back together) ran
      // ~10 jobs per leg to produce 3 scalars. The distinct key set makes
      // the join ≤1-match per dim row, so the full-outer row grain
      // carries all three counters at once: dim-side presence = n_dim,
      // both-present = n_referenced (≡ the semi-join count), key-side
      // only = n_orphan_keys (≡ the anti-join count, incl. the NULL fact
      // key that can never equi-match — the same null-latent-proofing).
      def leg(name: String, dim: org.apache.spark.sql.DataFrame, dk: String,
              fact: org.apache.spark.sql.DataFrame, fk: String) = {
        val keys = fact.select(col(fk).as("__k")).distinct()
        dim.select(col(dk).as("__dk"), lit(1).as("__d"))
          .join(keys.withColumn("__f", lit(1)),
            col("__dk") === col("__k"), "full_outer")
          .agg(count(col("__d")).as("n_dim"),
            count(when(col("__d").isNotNull && col("__f").isNotNull, 1))
              .as("n_referenced"),
            count(when(col("__f").isNotNull && col("__d").isNull, 1))
              .as("n_orphan_keys"))
          .select(lit(name).as("fk"), col("n_dim"), col("n_referenced"),
            col("n_orphan_keys"),
            (col("n_referenced").cast("double") / col("n_dim")).as("coverage"))
      }
      val li = Tables.lineitem(s, dir)
      Seq(
        leg("orders.o_custkey->customer", Tables.customer(s, dir), "c_custkey",
          Tables.orders(s, dir), "o_custkey"),
        leg("lineitem.l_orderkey->orders", Tables.orders(s, dir), "o_orderkey",
          li, "l_orderkey"),
        leg("lineitem.l_partkey->part", Tables.part(s, dir), "p_partkey",
          li, "l_partkey"),
        leg("lineitem.l_suppkey->supplier", Tables.supplier(s, dir), "s_suppkey",
          li, "l_suppkey"),
      ).reduce(_ unionByName _).orderBy("fk")
    },

    // ---- incremental materialized-view maintenance (the delta rule for
    //      an aggregated join view): V = Σ(lineitem ⋈ orders) by
    //      priority, maintained as base-partition aggregate + delta-
    //      partition aggregate + exact decimal re-combine — the engine
    //      NEVER recomputes the base from scratch. The ORACLE computes
    //      the view directly from the full join, so the hash match IS the
    //      proof that the incremental path reproduces the full rebuild
    //      (decimal partials combine exactly in any order — the same
    //      property that makes the merge correct on a real stream of
    //      deltas). q54 is the agg-only sibling; this adds the join leg:
    //      ΔV = agg(A ⋈ ΔB), merged = combine(V_base, ΔV). ----
    QueryDef("q134_incremental_join_view",
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val cutoff = "1997-01-01"
      def leg(ordersSlice: org.apache.spark.sql.DataFrame) =
        li.join(ordersSlice.select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("__rev"))
      val base = leg(o.filter(col("o_orderdate") < cutoff))
      val delta = leg(o.filter(col("o_orderdate") >= cutoff))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n_lines")).as("n_lines"),
          sum(col("__rev")).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    },

    // ---- one-pass table profiler ("DESCRIBE at scale"): per column, row
    //      count / nulls / EXACT distinct count / min-max — the first
    //      query anyone runs against an unknown 100 TB table. ONE scan:
    //      the per-column stats are schema-generated into a single agg
    //      row and unpivoted with stack (map-side Generate). The multiple
    //      exact COUNT(DISTINCT)s cost one Expand row-copy per column —
    //      the documented price of exactness; the approx twin is the
    //      q30/HLL surface. ----
    QueryDef("q129_table_profile", {
      val nums = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strs = Seq("l_returnflag", "l_linestatus")
      val arms = nums.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      } ++ strs.map { c =>
        s"""SELECT '$c', count(*), count(*) - count($c), count(DISTINCT $c),
           |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)
           |FROM lineitem""".stripMargin
      }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (s, dir) =>
      Maintenance.tableProfile(Tables.lineitem(s, dir),
          numericCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax"),
          stringCols = Seq("l_returnflag", "l_linestatus"))
        .orderBy("col_name")
    },
  )
}
