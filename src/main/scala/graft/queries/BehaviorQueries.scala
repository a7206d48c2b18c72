package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Parity._

/** Product/behavior analytics over the `events` stream table: cumulative
  * distinct users, weekly cohort retention, and ordered funnels — the
  * query family the reference's notebook gestures at (per-year counts,
  * trends) generalized to the shapes every event pipeline needs.
  *
  * Scale notes: all three avoid the naive "running COUNT(DISTINCT)"
  * (which re-scans history per day). Cumulative users reduces to
  * first-seen events (one aggregate over users + a tiny running sum);
  * retention reduces user-activity to distinct (user, week) rows before
  * any join; the funnel is per-user min-timestamp aggregates chained by
  * ordered joins — each stage one shuffle on user_id, and AQE coalesces
  * the monotonically shrinking stage tables.
  */
object BehaviorQueries {

  /** Funnel stage tables over raw events: first 'view' per user, first
    * 'click' at-or-after that view, first 'purchase' at-or-after that
    * click. Shared by q40 and the ordering unit test (TimeSeriesSpec) so
    * the test exercises the production stage logic.
    */
  private[graft] def funnelStages(
      e: org.apache.spark.sql.DataFrame): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    (v, c, p)
  }

  val all: Seq[QueryDef] = Seq(

    // ---- sweep-line interval concurrency: peak simultaneous sessions
    //      per (event_type, day) — the capacity-planning query. Each
    //      event becomes a [ts, ts + value·1s) interval; the sweep is
    //      ±1 deltas ordered by (instant, delta) — ends sort BEFORE
    //      starts at the same instant, so touching intervals never
    //      double-count — under a keyed running sum (the window
    //      partitions by event_type: no global sort; RANGE-frame peer
    //      semantics make same-instant batches atomic in both engines).
    //      floor() before the INTEGER cast is parity-critical: a bare
    //      CAST(DOUBLE AS INTEGER) truncates in Spark but ROUNDS in
    //      DuckDB, shifting interval ends by a second (caught at sf0.1).
    //      O(2n) points, one keyed window, one aggregate — the shape
    //      that survives 100 TB of session logs. ----
    QueryDef("q106_max_concurrency",
      """WITH iv AS (SELECT event_type, ts AS s_ts,
        |             ts + to_seconds(CAST(floor(value) AS INTEGER)) AS e_ts
        |           FROM events),
        |pts AS (SELECT event_type, s_ts AS pt, 1 AS delta FROM iv
        |        UNION ALL SELECT event_type, e_ts, -1 FROM iv),
        |run AS (SELECT event_type, pt,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY pt, delta) AS conc
        |  FROM pts)
        |SELECT event_type, strftime(pt, '%Y-%m-%d') AS day,
        |  CAST(max(conc) AS BIGINT) AS max_concurrent
        |FROM run GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val iv = Tables.events(s, dir).select(col("event_type"),
        col("ts").as("s_ts"),
        (col("ts") + expr("make_interval(0,0,0,0,0,0, CAST(floor(value) AS INT))"))
          .as("e_ts"))
      val pts = iv.select(col("event_type"), col("s_ts").as("pt"),
          lit(1).as("delta"))
        .unionByName(iv.select(col("event_type"), col("e_ts").as("pt"),
          lit(-1).as("delta")))
      val w = Window.partitionBy("event_type").orderBy(col("pt"), col("delta"))
      pts.withColumn("conc", sum(col("delta")).over(w))
        .groupBy(col("event_type"), dayStr(col("pt")).as("day"))
        .agg(max(col("conc")).cast("long").as("max_concurrent"))
        .orderBy("event_type", "day")
    },

    // ---- cumulative distinct users by day, via first-seen reduction ----
    QueryDef("q38_cumulative_users",
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
        |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d ORDER BY 1""".stripMargin) { (s, dir) =>
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .select(dayStr(col("day")).as("day"), col("new_users"), col("cum_users"))
        .orderBy("day")
    },

    // ---- weekly cohort retention triangle ----
    // cohort = week of first activity; one row per (cohort, week offset)
    // with the distinct users active that week. Activity is reduced to
    // distinct (user, week) FIRST — the join and aggregate never touch
    // raw event rows. Offsets are exact multiples of 7 days, so the
    // int division is exact in both engines.
    QueryDef("q39_retention",
      """WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST(datediff('day', cohort, wk) / 7 AS INTEGER) AS week_offset,
        |  count(*) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val uw = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      uw.join(cohort, "user_id")
        .groupBy(dayStr(col("cohort")).as("cohort_week"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // ---- ordered funnel: view → click → purchase, each step strictly
    //      at-or-after the user's previous step ----
    QueryDef("q40_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""".stripMargin) { (s, dir) =>
      val (v, c, p) = funnelStages(Tables.events(s, dir))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // ---- time-constrained funnel (q40 + conversion windows): each step
    //      must land within 1 hour of the previous step's first event —
    //      the form product analytics actually ships ("converted within
    //      an hour"), where the unconstrained funnel overcounts users who
    //      came back days later. Same per-user min-ts reduction chain,
    //      one extra band predicate riding each join; the per-user tables
    //      shrink at every stage, each stage one shuffle on user_id. ----
    QueryDef("q71_funnel_windowed",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts
        |        AND e.ts <= v.v_ts + INTERVAL 1 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |        AND e.ts <= c.c_ts + INTERVAL 1 HOUR GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") >= col("v_ts") &&
          col("ts") <= col("v_ts") + expr("interval 1 hour"))
        .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") >= col("c_ts") &&
          col("ts") <= col("c_ts") + expr("interval 1 hour"))
        .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // ---- gap-based batch sessionization: a new session starts after a
    //      >30-minute silence. lag + running-sum over ONE user-partitioned
    //      window, then a per-(user, session) aggregate that reuses the
    //      window's hash partitioning (user_id ⊆ grouping keys ⇒ Catalyst
    //      inserts NO second exchange — one shuffle end to end). This is
    //      the batch twin of st01's streaming session window; at 100 TB it
    //      scales because state is per-user-partition, never global. ----
    QueryDef("q58_sessionize",
      """WITH l AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM l)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
            1L).otherwise(0L))
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(tsStr(min(col("ts"))).as("session_start"),
          tsStr(max(col("ts"))).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // ---- first-order Markov transition matrix over per-user event
    //      sequences: P(next event type | current) — the behavioral
    //      model funnels (q40/q71) project a single path out of. One lag
    //      window per user (deterministic (ts, event_id) order), then a
    //      transition-count aggregate and a row-normalizing join; the
    //      probability is one int/int division → exact cross-engine
    //      doubles. At scale this is the per-user window + vocab²-sized
    //      aggregate shape — no global ordering anywhere. ----
    QueryDef("q96_markov_transitions",
      """WITH t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev,
        |    event_type AS cur
        |  FROM events),
        |c AS (SELECT prev, cur, count(*) AS n FROM t
        |      WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, sum(n) AS tn FROM c GROUP BY 1)
        |SELECT prev, cur, n, round(CAST(n AS DOUBLE) / tn, 6) AS p
        |FROM c JOIN tot USING (prev)
        |ORDER BY prev, cur""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val c = Tables.events(s, dir)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("cur"))
        .agg(count(lit(1)).as("n"))
      val tot = c.groupBy("prev").agg(sum(col("n")).as("tn"))
      c.join(broadcast(tot), "prev")
        .select(col("prev"), col("cur"), col("n"),
          round(col("n").cast("double") / col("tn"), 6).as("p"))
        .orderBy("prev", "cur")
    },

    // ---- rolling 7-day distinct active users per day (the DAU/WAU
    //      family's WAU-by-day) — WITHOUT the two shapes that die at
    //      scale: a COUNT(DISTINCT) over a RANGE window (unsupported in
    //      both engines) or a day×event theta join (nested-loop). Instead
    //      each user-activity DAY covers days d..d+6, so: dedup events to
    //      (user, day) grain FIRST, explode the constant 7-day coverage,
    //      dedup again, and one hash aggregate counts the users covering
    //      each day. Constant 7× fan-out on the (user, day) grain — both
    //      distincts are map-side-combinable hash aggs; the calendar
    //      clamp is a broadcast scalar join. ----
    QueryDef("q112_rolling_active_users",
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |cov AS (SELECT DISTINCT user_id, d + CAST(i AS INTEGER) AS day
        |        FROM ud CROSS JOIN range(0, 7) AS t(i)),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud)
        |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS active_7d
        |FROM cov, b WHERE day BETWEEN b.lo AND b.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ud = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cov = ud
        .select(col("user_id"), col("d"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(col("user_id"), date_add(col("d"), col("i")).as("day"))
        .distinct()
      val b = ud.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      cov.crossJoin(broadcast(b))
        .filter(col("day").between(col("lo"), col("hi")))
        .groupBy(dayStr(col("day")).as("day"))
        .agg(count(lit(1)).as("active_7d"))
        .orderBy("day")
    },

    // ---- last-touch attribution: each purchase is credited to the
    //      user's most recent view/click in the preceding 7 days, or
    //      'direct' if none — the marketing-analytics join every event
    //      warehouse runs. Equi-join on user_id carries the bounded
    //      lookback as a band predicate (sort-merge on user, never a
    //      theta join); one per-conversion row_number picks the latest
    //      touch ((ts, event_id) desc — deterministic under same-ts
    //      touches); conversion value flows through DECIMAL(18,2) so the
    //      channel sums are order-independent cross-engine. At scale:
    //      keyed by user, state bounded by the 7-day window, and the
    //      final rollup is 3 groups. ----
    QueryDef("q114_attribution",
      """WITH conv AS (SELECT event_id, user_id, ts,
        |                CAST(value AS DECIMAL(18,2)) AS v
        |              FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT event_id, user_id, ts, event_type FROM events
        |        WHERE event_type IN ('view', 'click')),
        |j AS (SELECT c.event_id AS conv_id, t.event_type AS channel,
        |        row_number() OVER (PARTITION BY c.event_id
        |          ORDER BY t.ts DESC, t.event_id DESC) AS rn
        |      FROM conv c JOIN tch t ON t.user_id = c.user_id
        |        AND t.ts <= c.ts AND t.ts > c.ts - INTERVAL 7 DAY),
        |att AS (SELECT conv_id, channel FROM j WHERE rn = 1)
        |SELECT coalesce(a.channel, 'direct') AS channel,
        |  count(*) AS n_conversions,
        |  CAST(sum(c.v) AS DOUBLE) AS attributed_value
        |FROM conv c LEFT JOIN att a ON a.conv_id = c.event_id
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").cast("decimal(18,2)").as("v"))
      val tch = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("t_ts"),
          col("event_type").as("channel"), col("event_id").as("t_id"))
      val w = Window.partitionBy("event_id")
        .orderBy(col("t_ts").desc, col("t_id").desc)
      val att = conv.join(tch, Seq("user_id"))
        .filter(col("t_ts") <= col("ts") &&
          col("t_ts") > col("ts") - expr("interval 7 days"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("channel"))
      conv.join(att, Seq("event_id"), "left")
        .select(coalesce(col("channel"), lit("direct")).as("channel"), col("v"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("v")).cast("double").as("attributed_value"))
        .orderBy("channel")
    },

    // ---- interval union (merge overlapping intervals): per user, the
    //      gaps-and-islands MERGE twin of q58's gap sessionize and q106's
    //      sweep-line — total covered time and merged-island count when
    //      each event holds [ts, ts + value·1s). One running max of
    //      interval ends over STRICTLY preceding rows marks island
    //      starts (s_ts > prev_max ⇒ disconnected), a running sum names
    //      islands, one aggregate per island, one per user. Durations
    //      stay exact epoch-microsecond longs end to end. All windows
    //      partition by user — keyed exchanges only, the no-global-sort
    //      discipline every interval-accounting pipeline needs. ----
    QueryDef("q115_interval_union",
      """WITH iv AS (SELECT user_id, event_id, ts AS s_ts,
        |             ts + to_seconds(CAST(floor(value) AS INTEGER)) AS e_ts
        |           FROM events),
        |m AS (SELECT user_id, s_ts, e_ts,
        |    max(e_ts) OVER (PARTITION BY user_id ORDER BY s_ts, e_ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
        |    event_id
        |  FROM iv),
        |fl AS (SELECT user_id, s_ts, e_ts, event_id,
        |    CASE WHEN prev_max IS NULL OR s_ts > prev_max THEN 1 ELSE 0 END
        |      AS is_new
        |  FROM m),
        |g AS (SELECT user_id, s_ts, e_ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY s_ts, e_ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM fl),
        |i AS (SELECT user_id, island, min(s_ts) AS st, max(e_ts) AS en
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(epoch_us(en) - epoch_us(st)) AS BIGINT) AS covered_us
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val iv = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("ts").as("s_ts"),
        (col("ts") + expr("make_interval(0,0,0,0,0,0, CAST(floor(value) AS INT))"))
          .as("e_ts"))
      val ord = Seq(col("s_ts"), col("e_ts"), col("event_id"))
      val wPrev = Window.partitionBy("user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("user_id").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("prev_max", max(col("e_ts")).over(wPrev))
        .withColumn("is_new",
          when(col("prev_max").isNull || col("s_ts") > col("prev_max"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s_ts")).as("st"), max(col("e_ts")).as("en"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(unix_micros(col("en")) - unix_micros(col("st"))).as("covered_us"))
        .orderBy("user_id")
    },

    // ---- top event paths (behavioral 3-gram mining — the "what do
    //      users actually do" query behind sankey/path-analysis UIs):
    //      per-user ordered event-type trigrams via two lead() calls on
    //      ONE window, then a global count and deterministic top-10
    //      ((n desc, path asc) — ties can't reorder across engines).
    //      Vocabulary-bounded output (|types|³ candidate paths), one
    //      keyed window + one agg at any volume. ----
    QueryDef("q116_event_paths",
      """WITH t AS (SELECT event_type,
        |    lead(event_type, 1) OVER w AS n1,
        |    lead(event_type, 2) OVER w AS n2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT event_type || '>' || n1 || '>' || n2 AS path
        |      FROM t WHERE n2 IS NOT NULL)
        |SELECT path, count(*) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("n1", lead(col("event_type"), 1).over(w))
        .withColumn("n2", lead(col("event_type"), 2).over(w))
        .filter(col("n2").isNotNull)
        .select(concat_ws(">", col("event_type"), col("n1"), col("n2"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    },

    // ---- time-to-convert distribution: view→purchase latency over the
    //      q40 funnel chain, reported as EXACT type-1 quantiles (value at
    //      rank ⌈q·n⌉ under a deterministic (duration, user) order — the
    //      ranks are integer arithmetic, so no interpolation float can
    //      disagree). Durations are exact epoch-micros longs. The rank
    //      window runs on the CONVERTED-USERS table (already collapsed
    //      to one row per user by the funnel's min-ts aggregates) — tiny
    //      relative to raw events at any volume, but if conversions are
    //      dense it is still O(users), so the rank comes from
    //      Prep.rankViaBuckets (partitioned intra-bucket rank + driver
    //      prefix map, exact — see its scaladoc) rather than a global
    //      window: identical rn values, no single-task sort even when
    //      the converted population is huge. The funnel output is
    //      localCheckpoint'd first — rankViaBuckets makes two extra
    //      narrow passes (edge sketch + bucket histogram) and re-running
    //      the 3-stage funnel for each would triple the dominant cost. ----
    QueryDef("q118_time_to_convert",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1),
        |d AS (SELECT p.user_id, epoch_us(p.p_ts) - epoch_us(v.v_ts) AS dur_us
        |      FROM p JOIN v ON v.user_id = p.user_id),
        |r AS (SELECT user_id, dur_us,
        |        row_number() OVER (ORDER BY dur_us, user_id) AS rn,
        |        count(*) OVER () AS n
        |      FROM d)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  min(dur_us) AS min_us,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN dur_us END) AS p50_us,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN dur_us END) AS p90_us,
        |  max(dur_us) AS max_us
        |FROM r""".stripMargin) { (s, dir) =>
      val (v, _, p) = funnelStages(Tables.events(s, dir))
      val d = p.join(v, "user_id")
        .select(col("user_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("dur_us"))
        .localCheckpoint()
      graft.ops.Prep.rankViaBuckets(d, col("dur_us"), col("user_id"),
          rankCol = "rn")
        .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
        .agg(max(col("n")).cast("long").as("n_converted"),
          min(col("dur_us")).as("min_us"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("dur_us")))
            .as("p50_us"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("dur_us")))
            .as("p90_us"),
          max(col("dur_us")).as("max_us"))
    },

    // ---- linear multi-touch attribution (q114's split-credit sibling):
    //      every view/click in the 7-day lookback shares the conversion
    //      equally — credit 1/n per touch. Parity: 1/n is NOT exactly
    //      summable as doubles, so each conversion's per-touch credit is
    //      quantized to the INTEGER 10⁹ div n (identical integer
    //      division in both engines) and channel totals sum those longs
    //      — exact in any order, the s24 quantized-mean discipline. Same
    //      user-keyed bounded-lookback join shape as q114; the credit
    //      rollup is 2 groups wide. ----
    QueryDef("q120_linear_attribution",
      """WITH conv AS (SELECT event_id, user_id, ts FROM events
        |              WHERE event_type = 'purchase'),
        |tch AS (SELECT event_id, user_id, ts, event_type FROM events
        |        WHERE event_type IN ('view', 'click')),
        |j AS (SELECT c.event_id AS conv_id, t.event_type AS channel,
        |        count(*) OVER (PARTITION BY c.event_id) AS n_touches
        |      FROM conv c JOIN tch t ON t.user_id = c.user_id
        |        AND t.ts <= c.ts AND t.ts > c.ts - INTERVAL 7 DAY)
        |SELECT channel,
        |  CAST(count(*) AS BIGINT) AS n_touchpoints,
        |  CAST(sum(1000000000 // n_touches) AS DOUBLE) / 1000000000.0
        |    AS attributed_conversions
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val tch = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("t_ts"),
          col("event_type").as("channel"))
      val wConv = Window.partitionBy("event_id")
      conv.join(tch, Seq("user_id"))
        .filter(col("t_ts") <= col("ts") &&
          col("t_ts") > col("ts") - expr("interval 7 days"))
        .withColumn("n_touches", count(lit(1)).over(wConv))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touchpoints"),
          (sum(expr("1000000000 div n_touches")).cast("double") /
            lit(1000000000.0)).as("attributed_conversions"))
        .orderBy("channel")
    },

    // ---- sequential pattern mining: per-user consecutive event-type
    //      bigrams in (ts, event_id) order — the ORDER-sensitive sibling
    //      of q123's unordered market baskets, the "what do users do
    //      next" primitive behind session-flow analysis and next-action
    //      models. One lead window per user (single shuffle on user_id),
    //      then a map-side-combinable count over the ~|types|² pattern
    //      space; n_users is the pattern's support (two-phase distinct
    //      agg, no row explosion). ----
    QueryDef("q142_seq_patterns",
      """WITH p AS (
        |  SELECT user_id, event_type AS step_a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step_b
        |  FROM events)
        |SELECT step_a, step_b, count(*) AS n_occurrences,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM p WHERE step_b IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY n_occurrences DESC, step_a, step_b""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("step_b", lead(col("event_type"), 1).over(w))
        .filter(col("step_b").isNotNull)
        .groupBy(col("event_type").as("step_a"), col("step_b"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_occurrences").desc, col("step_a"), col("step_b"))
    },
  )
}
