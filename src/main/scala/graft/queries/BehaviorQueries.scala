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
  )
}
