package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Prep, Stats}
import Parity._

/** Notebook-surface analytics (SURVEY.md §2.6 A3-A6, §2.7 W2, §2.8 L2-L4)
  * plus time/window/JSON operators: pivot, top-k, ranked windows, lag/lead,
  * moving averages, tumbling time buckets, deterministic sampling, JSON
  * extraction, null profiling.
  */
object AnalyticQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- A5: pivot count (events per day × event_type), zero-filled ----
    QueryDef("q17_pivot_daily",
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", dayStr(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("day")
    },

    // ---- L3: global top-k with deterministic tie-break ----
    QueryDef("q18_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- per-group top-k via ranked window ----
    QueryDef("q19_topk_per_segment",
      """SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))
        .orderBy("c_mktsegment", "rn")
    },

    // ---- W2: trailing 7-day moving average over the daily series ----
    QueryDef("q20_moving_avg_daily",
      """SELECT day, n_events,
        |  round(avg(day_avg) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_avg
        |FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
        |        avg(value) AS day_avg
        |      FROM events GROUP BY 1)
        |ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("day", dayStr(col("ts")))
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"), avg(col("value")).as("day_avg"))
        .transform(Stats.movingAvg(col("day_avg"), Seq(col("day")), n = 7))
        .select(col("day"), col("n_events"), round(col("moving_avg"), 4).as("moving_avg"))
        .orderBy("day")
    },

    // ---- L4: deterministic sampling via key modulus (portable, unlike
    //      rand(seed) which is engine-specific) ----
    QueryDef("q21_mod_sample",
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id % 97 < 5 ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") % 97 < 5)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // ---- A6: per-column null profile ----
    QueryDef("q22_null_profile",
      """SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice,
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderdate,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority
        |FROM orders""".stripMargin) { (s, dir) =>
      Stats.nullProfile(Tables.orders(s, dir))
    },

    // ---- tumbling time bucket (batch form of the streaming window) ----
    QueryDef("q23_hourly_agg",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(tsStr(date_trunc("hour", col("ts"))).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             decimalSum(col("value"), "sum_value"))
        .orderBy("hour", "event_type")
    },

    // ---- JSON extraction over events.props ----
    QueryDef("q24_json_extract",
      """SELECT event_type,
        |  avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
        |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(avg(k).as("avg_k"), count(k).as("n_k"))
        .orderBy("event_type")
    },

    // ---- VARIANT semi-structured type (Spark 4) — q24's modern twin:
    //      props parses ONCE into a binary variant column and every field
    //      access is a typed variant_get on the parsed form, not a
    //      re-parse of the JSON string per path (at 100 TB the parse is
    //      the cost; a stored variant column amortizes it to zero).
    //      try_variant_get on an absent path yields NULL (not an error) —
    //      pinned by n_missing == 0. Typed extraction means sum_k is
    //      exact integer arithmetic on both sides; the oracle wraps the
    //      sum in CAST(... AS BIGINT) because DuckDB's sum(INTEGER) is
    //      HUGEINT, which the grader materializes as float64 while
    //      Spark's sum(int) is int64 — values identical, dtypes not. ----
    QueryDef("q87_variant_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k,
        |  count(json_extract_string(props, '$.missing')) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val v = expr("parse_json(props)")
      Tables.events(s, dir)
        .withColumn("v", v)
        .groupBy(col("event_type"))
        .agg(
          sum(expr("variant_get(v, '$.k', 'int')")).as("sum_k"),
          count(expr("variant_get(v, '$.k', 'int')")).as("n_k"),
          count(expr("try_variant_get(v, '$.missing', 'string')")).as("n_missing"))
        .orderBy("event_type")
    },

    // ---- ranked-window family: rank / dense_rank / ntile / percent_rank ----
    QueryDef("q25_rank_family",
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(rank()       OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rnk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("int").as("rnk"),
          dense_rank().over(w).cast("int").as("drnk"),
          ntile(4).over(w).cast("int").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .orderBy("c_mktsegment", "rnk")
    },

    // ---- notebook cell 6/13 (histogram): fixed-width binned counts ----
    QueryDef("q27_histogram",
      """SELECT CAST(floor(value / 25.0) * 25 AS DOUBLE) AS bucket_lo,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy((floor(col("value") / 25.0) * 25).cast("double").as("bucket_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket_lo")
    },

    // ---- notebook cell 7 (boxplot): exact interpolated percentiles ----
    QueryDef("q28_percentiles",
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 4) AS p25,
        |  round(quantile_cont(value, 0.50), 4) AS p50,
        |  round(quantile_cont(value, 0.75), 4) AS p75,
        |  round(quantile_cont(value, 0.90), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.50)"), 4).as("p50"),
          round(expr("percentile(value, 0.75)"), 4).as("p75"),
          round(expr("percentile(value, 0.90)"), 4).as("p90"))
        .orderBy("event_type")
    },

    // ---- bivariate statistics: Pearson correlation + sample covariance
    //      (both engines use the same sample definitions) ----
    QueryDef("q32_correlation",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ---- per-group OLS: slope/intercept of price on quantity ----
    QueryDef("q33_regression",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))
        .orderBy("l_returnflag")
    },

    // ---- Welch's t-test: are 'click' and 'error' values drawn from the
    //      same distribution? Single conditional-aggregation pass (one
    //      exchange); t and the Welch–Satterthwaite df from the
    //      group (n, mean, sample-variance) triples. n counts NON-NULL
    //      values on both sides (count(value) FILTER / count(when)) so
    //      n, mean, and variance describe the same sample ----
    QueryDef("q41_welch_ttest",
      """WITH g AS (
        |  SELECT count(value) FILTER (WHERE event_type = 'click') AS n1,
        |    avg(value) FILTER (WHERE event_type = 'click') AS m1,
        |    var_samp(value) FILTER (WHERE event_type = 'click') AS v1,
        |    count(value) FILTER (WHERE event_type = 'error') AS n2,
        |    avg(value) FILTER (WHERE event_type = 'error') AS m2,
        |    var_samp(value) FILTER (WHERE event_type = 'error') AS v2
        |  FROM events)
        |SELECT n1, n2,
        |  round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t_stat,
        |  round(pow(v1/n1 + v2/n2, 2)
        |    / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)), 2) AS df
        |FROM g""".stripMargin) { (s, dir) =>
      val click = when(col("event_type") === "click", col("value"))
      val error = when(col("event_type") === "error", col("value"))
      val g = Tables.events(s, dir).agg(
        count(click).as("n1"), avg(click).as("m1"), var_samp(click).as("v1"),
        count(error).as("n2"), avg(error).as("m2"), var_samp(error).as("v2"))
      val se2 = col("v1") / col("n1") + col("v2") / col("n2")
      g.select(col("n1"), col("n2"),
        round((col("m1") - col("m2")) / sqrt(se2), 4).as("t_stat"),
        round(pow(se2, 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
           pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 2).as("df"))
    },

    // ---- two-sample Kolmogorov-Smirnov statistic: click vs error value
    //      distributions. D = max |F̂₁ − F̂₂| evaluated at every observed
    //      value: one distributed per-value count agg up front, then
    //      cumulative sums along the DISTINCT-value axis — the window is
    //      bounded by value cardinality, the same exact-twin class as
    //      q44's equi-depth histogram (the at-scale form bins first,
    //      q27's front). max() is order-independent, so cross-engine
    //      parity needs no decimal detour. This is the distribution-SHAPE
    //      drift test next to q52's binned PSI (PSI sees mass moving
    //      between coarse bins; KS sees any CDF separation). ----
    QueryDef("q93_ks_test",
      """WITH c AS (
        |  SELECT value,
        |    count(*) FILTER (WHERE event_type = 'click') AS ca,
        |    count(*) FILTER (WHERE event_type = 'error') AS cb
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY value),
        |n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |f AS (SELECT
        |    sum(ca) OVER (ORDER BY value) AS cuma,
        |    sum(cb) OVER (ORDER BY value) AS cumb
        |  FROM c)
        |SELECT CAST(na AS BIGINT) AS n_click, CAST(nb AS BIGINT) AS n_error,
        |  round(max(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_d
        |FROM f CROSS JOIN n GROUP BY na, nb""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .groupBy("value")
        .agg(count(when(col("event_type") === "click", 1)).as("ca"),
          count(when(col("event_type") === "error", 1)).as("cb"))
      val n = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      // the CDF runs over DISTINCT VALUES — not a bounded grain for a
      // continuous column (~18% of rows are distinct at sf0.1), so the
      // running sums come from the bucketed prefix-sum op (exact longs,
      // identical cuma/cumb) instead of an unpartitioned window
      graft.ops.Prep.runningTotalsViaBuckets(c, col("value"),
          Seq("ca" -> "cuma", "cb" -> "cumb"), inclusive = true)
        .crossJoin(broadcast(n))
        .groupBy("na", "nb")
        .agg(round(max(abs(
          col("cuma").cast("double") / col("na") -
            col("cumb").cast("double") / col("nb"))), 6).as("ks_d"))
        .select(col("na").cast("long").as("n_click"),
          col("nb").cast("long").as("n_error"), col("ks_d"))
    },

    // ---- chi-square test of independence: event-type mix × weekday —
    //      "does the label distribution depend on the day?" next to
    //      q41's two-sample means test and q93's two-sample CDF test.
    //      One contingency-cell aggregate; margins join back (the column
    //      margin broadcast, the scalar N broadcast). Each (o−e)²/e term
    //      goes through DECIMAL(28,10) before the sum — 35 double terms
    //      summed in engine-specific order would be the classic last-ulp
    //      parity trap (same fix as q37's frame sums). ----
    QueryDef("q95_chi_square",
      """WITH cells AS (
        |  SELECT event_type, CAST(isodow(ts) - 1 AS INTEGER) AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
        |m AS (SELECT sum(o) AS n,
        |        (count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS df
        |      FROM cells),
        |t AS (SELECT
        |    CAST((o - CAST(r AS DOUBLE) * c / n) * (o - CAST(r AS DOUBLE) * c / n)
        |         / (CAST(r AS DOUBLE) * c / n) AS DECIMAL(28,10)) AS term,
        |    n, df
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(df AS INTEGER) AS df,
        |  round(CAST(sum(term) AS DOUBLE), 4) AS chi2
        |FROM t GROUP BY n, df""".stripMargin) { (s, dir) =>
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"), weekday(col("ts")).as("dow"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
      val ct = cells.groupBy("dow").agg(sum(col("o")).as("c"))
      val m = cells.agg(sum(col("o")).as("n"),
        ((countDistinct(col("event_type")) - 1) *
          (countDistinct(col("dow")) - 1)).as("df"))
      val e = col("r").cast("double") * col("c") / col("n")
      cells.join(rt, "event_type").join(broadcast(ct), "dow")
        .crossJoin(broadcast(m))
        .withColumn("term",
          ((col("o") - e) * (col("o") - e) / e).cast("decimal(28,10)"))
        .groupBy("n", "df")
        .agg(round(sum(col("term")).cast("double"), 4).as("chi2"))
        .select(col("n").cast("long").as("n"), col("df").cast("int").as("df"),
          col("chi2"))
    },

    // ---- Shannon entropy of the event-type mix per day — the label-
    //      distribution-drift check a training pipeline monitors. Uses
    //      H = ln(T) − Σ c·ln(c) / T over the counts, so one aggregate
    //      pair and no per-row p column ----
    QueryDef("q42_entropy",
      """SELECT day,
        |  CAST(sum(c) AS BIGINT) AS n,
        |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
        |FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS c
        |      FROM events GROUP BY 1, 2)
        |GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(dayStr(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy("day")
        .agg(sum(col("c")).as("n"),
          round(log(sum(col("c"))) -
            sum(col("c") * log(col("c"))) / sum(col("c")), 6).as("entropy"))
        .select(col("day"), col("n"), col("entropy"))
        .orderBy("day")
    },

    // ---- KL divergence of each source's language mix vs the corpus
    //      overall — the per-shard distribution-drift check (pairs with
    //      q42's entropy). Absent (source, lang) cells contribute 0 and
    //      drop out naturally; everything derives from one (source, lang)
    //      count table ----
    QueryDef("q43_kl_divergence",
      """WITH sl AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
        |s AS (SELECT source, sum(c) AS n FROM sl GROUP BY 1),
        |g AS (SELECT lang, sum(c) AS gc FROM sl GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM sl)
        |SELECT source, CAST(s.n AS BIGINT) AS n_docs,
        |  round(sum((CAST(c AS DOUBLE) / s.n)
        |        * ln((CAST(c AS DOUBLE) / s.n) / (CAST(gc AS DOUBLE) / tot.n))), 6) AS kl
        |FROM sl JOIN s USING (source) JOIN g USING (lang) CROSS JOIN tot
        |GROUP BY source, s.n ORDER BY source""".stripMargin) { (s, dir) =>
      // the (source, lang) count table feeds FOUR consumers (itself, the
      // two marginals, the total) — materialize once (O(categories) rows)
      // or each derives from its own full scan of the fact
      val sl = Tables.documents(s, dir)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val perSource = sl.groupBy("source").agg(sum(col("c")).as("n"))
      val perLang = sl.groupBy("lang").agg(sum(col("c")).as("gc"))
      val total = sl.agg(sum(col("c")).as("tot"))
      val p = col("c").cast("double") / col("n")
      val q = col("gc").cast("double") / col("tot")
      sl.join(perSource, "source").join(perLang, "lang")
        .crossJoin(broadcast(total))
        .groupBy(col("source"), col("n"))
        .agg(round(sum(p * log(p / q)), 6).as("kl"))
        .select(col("source"), col("n").as("n_docs"), col("kl"))
        .orderBy("source")
    },

    // ---- equi-depth histogram: 10 equal-count buckets of `value` via
    //      ntile with a deterministic tie-break. The global-order window
    //      is single-partition BY DESIGN here (exact bucket edges for the
    //      oracle); the 100 TB form swaps ntile for approx_percentile
    //      edges + a join, same output schema ----
    QueryDef("q44_equidepth_hist",
      """SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n,
        |  round(min(value), 4) AS lo, round(max(value), 4) AS hi
        |FROM (SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val w = Window.orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .select(col("value"), ntile(10).over(w).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
        .orderBy("bucket")
    },

    // ---- equi-depth histogram, THE SCALE FORM: approx_percentile edges
    //      (one tree-reduced aggregate) broadcast back, bucket assigned
    //      map-side by counting edges below the value — no global-order
    //      window anywhere. Same output schema as q44; sketch edges are
    //      engine-specific → rows-only, with a bound test vs the exact
    //      form in QueriesSpec ----
    QueryDef.noOracle("q45_equidepth_approx") { (s, dir) =>
      val edges = Tables.events(s, dir).agg(
        percentile_approx(col("value"),
          array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("edges"))
      Tables.events(s, dir)
        .crossJoin(broadcast(edges))
        .select(col("value"),
          (lit(1) + size(filter(col("edges"), e => col("value") > e))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
        .orderBy("bucket")
    },

    // ---- as-of join: latest order per customer at each event time ----
    // Union-spine formulation (no join at all): tag orders kind=0 and
    // events kind=1, union on (key, time), and carry the latest order
    // forward with a running `last(..., ignoreNulls)` window, then keep
    // the event rows. One shuffle on the key, O(rows) work — the naive
    // range join materializes O(events × orders-per-user) rows before
    // its rank filter, which explodes with dense per-key history at
    // 100 TB. Ordering (t asc, kind asc, o_orderkey asc) makes the
    // running last() pick max-by-(o_orderdate, o_orderkey) among orders
    // with o_orderdate <= ts (orders sort before events at equal time,
    // so the <= bound is inclusive) — exactly the rank-filter tie-break.
    QueryDef("q29_asof_join",
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("k"),
        col("o_orderdate").as("t"),
        lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"), col("o_orderdate"))
      val e = Tables.events(s, dir).select(
        col("user_id").as("k"), col("ts").as("t"), lit(1).as("kind"),
        col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("timestamp").as("o_orderdate"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("kind"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .select(col("k"), col("t"), col("kind"), col("event_id"),
          last(col("o_orderkey"), ignoreNulls = true).over(w).as("asof_key"),
          last(col("o_orderdate"), ignoreNulls = true).over(w).as("asof_date"))
        .filter(col("kind") === 1 && col("asof_key").isNotNull)
        .select(col("event_id"), col("k").as("user_id"),
          tsStr(col("t")).as("event_ts"),
          col("asof_key").as("o_orderkey"), dayStr(col("asof_date")).as("order_date"))
        .orderBy("event_id")
    },

    // ---- bounded as-of join (q29 + max staleness): the feature-store
    //      form — a match older than the bound is no match (serving stale
    //      features silently is the classic training/serving bug; the
    //      9000-day bound is sized to the fixture's events-vs-orders date
    //      gap so it splits the order span instead of matching nothing or
    //      everything). Same
    //      join-free union-spine, ONE extra filter after the pick: the
    //      as-of match is the LATEST order ≤ t, so if IT is stale every
    //      earlier candidate is staler — bounding after the pick equals
    //      bounding inside the join predicate (what the oracle does). ----
    QueryDef("q72_asof_bounded",
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |       AND o.o_orderdate >= e.ts - INTERVAL 9000 DAY)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("k"),
        col("o_orderdate").as("t"),
        lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"), col("o_orderdate"))
      val e = Tables.events(s, dir).select(
        col("user_id").as("k"), col("ts").as("t"), lit(1).as("kind"),
        col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("timestamp").as("o_orderdate"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("kind"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionByName(e)
        .select(col("k"), col("t"), col("kind"), col("event_id"),
          last(col("o_orderkey"), ignoreNulls = true).over(w).as("asof_key"),
          last(col("o_orderdate"), ignoreNulls = true).over(w).as("asof_date"))
        .filter(col("kind") === 1 && col("asof_key").isNotNull &&
          col("asof_date") >= col("t") - expr("interval 9000 days"))
        .select(col("event_id"), col("k").as("user_id"),
          tsStr(col("t")).as("event_ts"),
          col("asof_key").as("o_orderkey"), dayStr(col("asof_date")).as("order_date"))
        .orderBy("event_id")
    },

    // ---- approx distinct (HLL sketches differ across engines → the
    //      driver records a rows-only check; exactness bound tested in
    //      QueriesSpec against q11's exact counts) ----
    QueryDef.noOracle("q30_approx_distinct") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(approx_count_distinct(col("l_suppkey")).as("approx_suppliers"),
             approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("ship_year")
    },

    // ---- mergeable HLL sketches: per-(type, day) DataSketches HLL
    //      partials, union-merged to per-type distinct-user estimates —
    //      the INCREMENTAL distinct-count pattern (store daily sketches,
    //      re-merge any window without rescanning history; q54 is the
    //      same move for sums). Sketch binaries are engine-specific →
    //      rows-only; StatsSpec bounds the estimate against the exact
    //      distinct count and pins partial-merge ≈ one-shot sketch. ----
    QueryDef.noOracle("q59_hll_merge") { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    },

    // ---- DRIVER-VISIBLE sketch bounds for the three rows-only approx
    //      queries (q30/q45/q59): each bound query computes BOTH the
    //      approx sketch and its exact counterpart engine-side and emits
    //      the exact values plus a within_bound boolean; the oracle
    //      re-derives the exact side and asserts TRUE — so a sketch
    //      drifting past its tolerance flips the hash and FAILS the
    //      correctness gate every round, not just the sbt StatsSpec
    //      tests. Sketches are deterministic given the data, so the
    //      boolean is stable across rounds at the gate's fixed sf. ----

    // q30's bound: per-ship-year HLL++ distinct estimates within 5%
    // relative error of the exact distinct counts (rsd default = 0.05).
    QueryDef("q151_approx_distinct_bound",
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  count(DISTINCT l_suppkey) AS exact_suppliers,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(countDistinct(col("l_suppkey")).as("exact_suppliers"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_suppkey")).as("__as"),
          approx_count_distinct(col("l_partkey")).as("__ap"))
        .select(col("ship_year"), col("exact_suppliers"), col("exact_parts"),
          (abs(col("__as") - col("exact_suppliers")).cast("double") <=
            lit(0.05) * col("exact_suppliers") &&
           abs(col("__ap") - col("exact_parts")).cast("double") <=
            lit(0.05) * col("exact_parts")).as("within_bound"))
        .orderBy("ship_year")
    },

    // q45's bound: the approx equi-depth histogram still produces 10
    // buckets whose depths stay within 5% of the ideal N/10 (the
    // accuracy=10000 sketch is near-exact at gate scale).
    QueryDef("q152_equidepth_bound",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(10 AS BIGINT) AS n_buckets,
        |  TRUE AS within_bound
        |FROM events""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val edges = ev.agg(
        percentile_approx(col("value"),
          array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("edges"))
      val buckets = ev
        .crossJoin(broadcast(edges))
        .select((lit(1) + size(filter(col("edges"), e => col("value") > e)))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val tot = buckets.agg(sum(col("n")).as("__tot"), count(lit(1)).as("__k"))
      buckets.crossJoin(broadcast(tot))
        .groupBy()
        .agg(max(col("__tot")).as("n_rows"), max(col("__k")).as("n_buckets"),
          max(abs(col("n") * 10 - col("__tot"))).as("__dev"))
        .select(col("n_rows"), col("n_buckets"),
          (col("__dev").cast("double") <= lit(0.05) * col("n_rows"))
            .as("within_bound"))
    },

    // q59's bound: the merged per-day DataSketches HLL estimate stays
    // within 5% of the exact per-type distinct-user count, and the day
    // partials cover exactly the distinct (type, day) grain.
    QueryDef("q153_hll_merge_bound",
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val est = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"),
          count(lit(1)).as("n_days"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"), col("n_days"),
          (abs(col("__est") - col("exact_users")).cast("double") <=
            lit(0.05) * col("exact_users")).as("within_bound"))
        .orderBy("event_type")
    },

    // ---- exponentially time-decayed average: recency-weighted per-user
    //      value with a 7-day half-life-style decay against the corpus
    //      max timestamp — the feature-freshness aggregate a training
    //      pipeline keeps per entity. One aggregate pass; the reference
    //      timestamp is a 1-row broadcast, so the ratio-of-sums stays a
    //      single partial+final aggregate (no window, no sort). ----
    QueryDef("q60_decayed_avg",
      """WITH m AS (SELECT max(ts) AS tmax FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value * exp((epoch_us(ts) - epoch_us(tmax)) / 6.048e11))
        |        / sum(exp((epoch_us(ts) - epoch_us(tmax)) / 6.048e11)), 6)
        |    AS decayed_avg
        |FROM events CROSS JOIN m
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val tmax = ev.agg(max(col("ts")).as("tmax"))
      val w = exp((unix_micros(col("ts")) - unix_micros(col("tmax")))
        .cast("double") / 6.048e11)
      ev.crossJoin(broadcast(tmax))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") * w) / sum(w), 6).as("decayed_avg"))
        .select(col("user_id"), col("n"), col("decayed_avg"))
        .orderBy("user_id")
    },

    // ---- lag / lead / first_value over an ordered per-key series ----
    QueryDef("q26_lag_lead",
      """SELECT event_id, user_id, value,
        |  lag(value)  OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  first_value(value) OVER w AS first_value,
        |  value - lag(value) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first_value(col("value")).over(w).as("first_value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    },

    // ---- unpivot / melt (q17's inverse): wide measure columns → long
    //      (measure, val) rows via the native Dataset.unpivot — a
    //      Generate-based row expansion, wholly map-side (no shuffle
    //      beyond the final ordering). The long form is what feature
    //      stores and per-measure quality checks consume. ----
    QueryDef("q68_unpivot_measures",
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |         CAST(l_quantity AS DOUBLE) AS val FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', CAST(l_tax AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey < 1000)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity").cast("double").as("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // ---- the SQL UNPIVOT clause — q68's SQL-syntax twin (the same
    //      relationship q86's SQL PIVOT has to q17's DataFrame pivot): a
    //      user migrating warehouse SQL writes this text verbatim, and it
    //      plans the identical Generate-based map-side expansion. The
    //      oracle is the explicit UNION ALL expansion (DuckDB's UNPIVOT
    //      spelling differs — the semantics, not the text, are shared). ----
    QueryDef("q137_unpivot_sql",
      """SELECT o_orderkey, measure, val FROM (
        |  SELECT o_orderkey, 'o_totalprice' AS measure,
        |         CAST(o_totalprice AS DOUBLE) AS val
        |  FROM orders WHERE o_orderkey < 2000
        |  UNION ALL
        |  SELECT o_orderkey, 'o_custkey', CAST(o_custkey AS DOUBLE)
        |  FROM orders WHERE o_orderkey < 2000)
        |ORDER BY o_orderkey, measure""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, measure, val FROM (
          |  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
          |         CAST(o_custkey AS DOUBLE) AS o_custkey
          |  FROM orders WHERE o_orderkey < 2000)
          |UNPIVOT (val FOR measure IN (o_totalprice, o_custkey))
          |ORDER BY o_orderkey, measure""".stripMargin)
    },

    // ---- FILTER-clause aggregates: per-group conditional KPIs in ONE
    //      aggregation pass — the SQL-standard spelling of the
    //      when/otherwise pivot (q17/A5). Every FILTER arm is a codegen'd
    //      conditional inside the same hash aggregate: one scan, one
    //      shuffle, regardless of how many conditions a dashboard stacks.
    //      An all-false arm yields NULL avg / 0 count in both engines.
    //      The DataFrame side embeds the clause via expr() — the parser
    //      path a SQL-writing user exercises. ----
    QueryDef("q82_filtered_agg",
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS avg_urgent_price,
        |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000.0) AS n_big_custs
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("count(*) FILTER (WHERE o_totalprice > 200000.0)").as("n_big"),
          expr("count(*) FILTER (WHERE o_orderpriority = '1-URGENT')").as("n_urgent"),
          round(expr("avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')"), 4)
            .as("avg_urgent_price"),
          expr("count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000.0)")
            .as("n_big_custs"))
        .orderBy("c_mktsegment")
    },

    // ---- approx_top_k heavy hitters: the sketch-based frequent-items
    //      aggregate (mergeable partial state, one pass, no global sort).
    //      The sketch tracks up to maxItemsTracked=100 distinct items and
    //      is EXACT whenever the true cardinality fits the tracker (5
    //      event types here) — so unlike the HLL/percentile sketches
    //      (q30/q45, rows-only) this approx query carries a full DuckDB
    //      oracle: the exact GROUP BY top-k must match bit-for-bit. At
    //      real cardinalities the same plan degrades gracefully to
    //      approximate counts while staying one mergeable pass. ----
    QueryDef("q83_approx_topk",
      """SELECT event_type AS item, count(*) AS est_count
        |FROM events GROUP BY 1
        |ORDER BY est_count DESC, item LIMIT 3""".stripMargin) { (s, dir) =>
      // overfetch k=5 (≥ the true cardinality) then cut to 3 under OUR
      // (count desc, item) order: the sketch's own choice among items
      // TIED at the k-boundary is unspecified, so the deterministic
      // tie-break must happen after the sketch, not inside it
      Tables.events(s, dir)
        .agg(expr("approx_top_k(event_type, 5, 100)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("est_count"))
        .orderBy(col("est_count").desc, col("item"))
        .limit(3)
    },

    // ---- SQL PIVOT clause (q17's DataFrame pivot covers the semantics;
    //      this is the parser surface a SQL user writes). An explicit IN
    //      list avoids the distinct-values pre-scan; note Spark still
    //      plans PIVOT as TWO aggregates (on (group, pivot) then
    //      pivot-first on group — 2 exchanges, PlanSpec pins it), so the
    //      1-exchange spelling of the same table is the CASE-count
    //      crosstab the oracle below uses. Empty cells come back NULL
    //      from PIVOT — the outer coalesce zero-fills them to match the
    //      crosstab's native 0s. ----
    QueryDef("q86_pivot_sql",
      """SELECT c_mktsegment,
        |  count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        |  count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
        |  count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_mktsegment,
          |  coalesce(urgent, 0) AS n_urgent,
          |  coalesce(high, 0)   AS n_high,
          |  coalesce(low, 0)    AS n_low
          |FROM (SELECT c_mktsegment, o_orderpriority
          |      FROM orders JOIN customer ON o_custkey = c_custkey)
          |PIVOT (count(*) FOR o_orderpriority IN
          |       ('1-URGENT' AS urgent, '2-HIGH' AS high, '5-LOW' AS low))
          |ORDER BY c_mktsegment""".stripMargin)
    },

    // ---- per-group OLS regression: the closed-form least-squares trend
    //      of `value` on time, one line per event type — the grouped twin
    //      of t19's single-series Zipf fit, and the "°C per decade" query
    //      every climate/drift dashboard runs. All four moments are exact
    //      (x is a small day offset so Σx/Σx² stay integral; the y-moments
    //      go through DECIMAL like every money sum), and the closed-form
    //      slope/intercept is then a fixed chain of IEEE doubles both
    //      engines evaluate identically from identical inputs. One
    //      aggregate over the fact — no window, no second pass. ----
    QueryDef("q97_ols_trend",
      s"""WITH p AS (SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
         |    value AS y
         |  FROM events),
         |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
         |    CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
         |  FROM p GROUP BY 1),
         |r AS (SELECT event_type, n, sx, sy,
         |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
         |  FROM m)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  ${Prep.floorToSql("slope", 6)} AS slope,
         |  ${Prep.floorToSql("(sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 4)} AS intercept
         |FROM r ORDER BY event_type""".stripMargin) { (s, dir) =>
      Stats.olsFit(Tables.events(s, dir), Seq("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long"),
          col("value"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          Prep.floorTo(col("slope"), 6).as("slope"),
          Prep.floorTo(col("intercept"), 4).as("intercept"))
        .orderBy("event_type")
    },

    // ---- Mann-Whitney U: the RANK-based two-sample location test —
    //      completes the drift-test family (q41 compares means, q93
    //      compares CDF shapes, q95 categorical mixes; this one is the
    //      robust nonparametric member). Reduces the fact to per-value
    //      counts FIRST (like q93), so the ranking window runs over
    //      distinct values, not rows; tied values get the textbook
    //      average rank, computed exactly from the prior cumulative count
    //      (all ranks are multiples of ½, so every sum below is exact in
    //      doubles — order-independent with no decimal detour). ----
    QueryDef("q99_mann_whitney",
      s"""WITH c AS (SELECT value,
         |    count(*) FILTER (WHERE event_type = 'view') AS ca,
         |    count(*) FILTER (WHERE event_type = 'purchase') AS cb
         |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY value),
         |n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
         |w AS (SELECT ca, cb,
         |    coalesce(sum(ca + cb) OVER (ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
         |  FROM c),
         |r AS (SELECT sum(ca * (prior + (ca + cb + 1) / 2.0)) AS r1 FROM w),
         |u AS (SELECT na, nb, r1 - na * (na + 1) / 2.0 AS u1 FROM r CROSS JOIN n)
         |SELECT CAST(na AS BIGINT) AS n_view, CAST(nb AS BIGINT) AS n_purchase,
         |  u1, CAST(na AS DOUBLE) * nb - u1 AS u2,
         |  ${Prep.floorToSql(
             "(u1 - CAST(na AS DOUBLE) * nb / 2.0) / sqrt(CAST(na AS DOUBLE) * nb * (na + nb + 1) / 12.0)", 4)} AS z
         |FROM u""".stripMargin) { (s, dir) =>
      Stats.mannWhitneyU(Tables.events(s, dir),
          isA = col("event_type") === "view",
          isB = col("event_type") === "purchase",
          value = col("value"))
        .select(col("n_a").cast("long").as("n_view"),
          col("n_b").cast("long").as("n_purchase"),
          col("u1"), col("u2"), Prep.floorTo(col("z"), 4).as("z"))
    },

    // ---- Benford first-digit audit: the classic fabricated-numbers /
    //      corrupted-feed detector. The leading significant digit comes
    //      from the DECIMAL(18,2) string form — fixed-scale decimal
    //      rendering is identical across engines, where double→string and
    //      log10-of-magnitude tricks both have representability edges.
    //      One narrow aggregate over the fact + a broadcast scalar total.
    QueryDef("q101_benford",
      s"""WITH d AS (SELECT CAST(regexp_extract(
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '[1-9]', 0)
         |    AS INTEGER) AS digit
         |  FROM orders),
         |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         |t AS (SELECT sum(n) AS total FROM c)
         |SELECT digit, CAST(n AS BIGINT) AS n,
         |  ${Prep.floorToSql("CAST(n AS DOUBLE) / total", 6)} AS p_obs,
         |  ${Prep.floorToSql("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)} AS p_benford,
         |  ${Prep.floorToSql(
             "abs(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))", 6)} AS abs_dev
         |FROM c CROSS JOIN t ORDER BY digit""".stripMargin) { (s, dir) =>
      val d = Tables.orders(s, dir).select(
        regexp_extract(col("o_totalprice").cast("decimal(18,2)").cast("string"),
          "[1-9]", 0).cast("int").as("digit"))
      val c = d.groupBy("digit").agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("total"))
      val pBen = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
      c.crossJoin(broadcast(t))
        .select(col("digit"), col("n").cast("long").as("n"),
          Prep.floorTo(col("n").cast("double") / col("total"), 6).as("p_obs"),
          Prep.floorTo(pBen, 6).as("p_benford"),
          Prep.floorTo(abs(col("n").cast("double") / col("total") - pBen), 6)
            .as("abs_dev"))
        .orderBy("digit")
    },

    // ---- rank-based feature normalization: percent_rank / cume_dist /
    //      ntile quartile per segment — the distribution-free scaling a
    //      feature pipeline applies when min-max (q62) is outlier-fragile.
    //      Both rank ratios are exact integer quotients evaluated
    //      identically by any engine given a deterministic total order
    //      (the custkey tie-break). Windows partition by segment — keyed
    //      exchanges, no global sort. ----
    QueryDef("q105_rank_normalize",
      s"""SELECT c_mktsegment, c_custkey, c_acctbal,
         |  ${Prep.floorToSql("percent_rank() OVER w", 6)} AS pct_rank,
         |  ${Prep.floorToSql("cume_dist() OVER w", 6)} AS cum_dist,
         |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
         |FROM customer
         |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          Prep.floorTo(percent_rank().over(w), 6).as("pct_rank"),
          Prep.floorTo(cume_dist().over(w), 6).as("cum_dist"),
          ntile(4).over(w).cast("int").as("quartile"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    },

    // ---- Pareto frontier (2-D skyline, Börzsönyi et al. 2001): parts no
    //      other part strictly dominates on (price ↓, size ↑) — "cheapest
    //      for its capability". The O(n·log n) sort-based form, NOT the
    //      O(n²) dominance anti-join: collapse to price grain (max size
    //      per price), then one running max over STRICTLY cheaper prices
    //      (ROWS … 1 PRECEDING on the price-grain table, where peers
    //      can't exist) marks the frontier; ties on (price, size) all
    //      survive — strict dominance only. At 100 TB the price-grain
    //      collapse is a map-side-combinable agg and the window runs over
    //      the DISTINCT-PRICE table (bounded domain: 2-decimal prices),
    //      not the row count; the frontier join back is broadcast. ----
    QueryDef("q111_pareto_frontier",
      """WITH pb AS (SELECT p_partkey, p_retailprice AS price, p_size AS size
        |            FROM part),
        |best AS (SELECT price, max(size) AS best_size FROM pb GROUP BY 1),
        |r AS (SELECT price, best_size,
        |        max(best_size) OVER (ORDER BY price
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
        |      FROM best),
        |f AS (SELECT price, best_size FROM r
        |      WHERE prev_best IS NULL OR prev_best < best_size)
        |SELECT p.p_partkey, p.price, CAST(p.size AS INTEGER) AS size
        |FROM pb p JOIN f ON p.price = f.price AND p.size = f.best_size
        |ORDER BY p.price, p.p_partkey""".stripMargin) { (s, dir) =>
      val pb = Tables.part(s, dir).select(col("p_partkey"),
        col("p_retailprice").as("price"), col("p_size").as("size"))
      val best = pb.groupBy("price").agg(max(col("size")).as("best_size"))
      val wPrev = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = best
        .withColumn("prev_best", max(col("best_size")).over(wPrev))
        .filter(col("prev_best").isNull || col("prev_best") < col("best_size"))
        .select(col("price").as("f_price"), col("best_size"))
      pb.join(broadcast(frontier),
          col("price") === col("f_price") && col("size") === col("best_size"))
        .select(col("p_partkey"), col("price"), col("size").cast("int").as("size"))
        .orderBy("price", "p_partkey")
    },
  )
}
