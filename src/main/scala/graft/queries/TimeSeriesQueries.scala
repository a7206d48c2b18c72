package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TimeSeries
import Parity._

/** Time-series surface beyond the reference's calendar aggregates:
  * calendar-spine gap filling with forward fill, banded interval joins,
  * and time-based RANGE window frames — the resample/rolling operations
  * the reference's notebook does in pandas (SURVEY.md §2.7 W2), here as
  * distributed shapes that hold at 100 TB.
  */
object TimeSeriesQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- gap-fill + forward-fill over a per-user daily calendar spine ----
    // Spine = users × sequence(min_day, max_day) generated distributively
    // (no driver calendar); missing days get n_events = 0 and the last
    // observed daily average carried forward (leading nulls stay null —
    // nothing to carry yet).
    QueryDef("q34_gap_fill",
      """WITH e AS (SELECT * FROM events WHERE user_id < 10),
        |bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM e),
        |keys AS (SELECT DISTINCT user_id FROM e),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM keys, bounds),
        |daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |            round(avg(value), 4) AS day_avg
        |          FROM e GROUP BY 1, 2)
        |SELECT s.user_id AS user_id, strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(n_events, 0) AS n_events,
        |  last_value(day_avg IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
        |FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") < 10)
      val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), round(avg(col("value")), 4).as("day_avg"))
      TimeSeries.dailySpine(e, col("user_id"), to_date(col("ts")))
        .withColumnRenamed("k", "user_id")
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
        .withColumn("filled_avg",
          TimeSeries.forwardFill(col("day_avg"), Seq(col("user_id")), col("day")))
        .select(col("user_id"), dayStr(col("day")).as("day"),
          col("n_events"), col("filled_avg"))
        .orderBy("user_id", "day")
    },

    // ---- banded interval join: clicks within 5 min before each error ----
    // The engine form is an equi-join on (user, time-bin) + exact range
    // filter (TimeSeries.countInWindow) — the oracle states the same
    // semantics as a raw range join, which DuckDB can afford at sf0.01.
    QueryDef("q35_interval_join",
      """SELECT a.event_id, count(b.event_id) AS n_clicks_5m
        |FROM events a LEFT JOIN events b
        |  ON b.user_id = a.user_id AND b.event_type = 'click'
        |  AND b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts <= a.ts
        |WHERE a.event_type = 'error'
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      TimeSeries.countInWindow(
          ev.filter(col("event_type") === "error"),
          col("user_id"), col("ts"), col("event_id"),
          ev.filter(col("event_type") === "click"),
          col("user_id"), col("ts"), windowSec = 300L)
        .select(col("p_id").as("event_id"), col("n_matches").as("n_clicks_5m"))
        .orderBy("event_id")
    },

    // ---- time-based RANGE frame: trailing 7 calendar days, not 7 rows ----
    // RANGE over epoch-day covers exactly the days present in the window
    // even when the daily series has gaps (ROWS would silently widen the
    // time span). The frame sum runs over DECIMAL(18,6) in BOTH engines —
    // double frame sums would be order-dependent (Spark slides
    // left-to-right, DuckDB combines via segment tree) and could flip a
    // round(...,4) boundary in the last ulp.
    QueryDef("q37_range_frame",
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS revenue
        |  FROM lineitem GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  round(CAST(revenue AS DOUBLE), 4) AS revenue,
        |  round(CAST(sum(revenue) OVER (ORDER BY datediff('day', DATE '1970-01-01', day)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS rev_7d
        |FROM daily ORDER BY day""".stripMargin) { (s, dir) =>
      val daily = Tables.lineitem(s, dir)
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).as("revenue"))
        .withColumn("epoch_day", datediff(col("day"), lit("1970-01-01")))
      val w = Window.orderBy(col("epoch_day")).rangeBetween(-6, 0)
      daily
        .withColumn("rev_7d", round(sum(col("revenue")).over(w).cast("double"), 4))
        .select(dayStr(col("day")).as("day"),
          round(col("revenue").cast("double"), 4).as("revenue"),
          col("rev_7d"))
        .orderBy("day")
    },

    // ---- autocorrelation function of the daily event-count series at
    //      lags 1..7 — the stationarity/seasonality diagnostic run before
    //      fitting any forecast (the reference's notebook eyeballs its
    //      monthly series; ACF is that check quantified). Pearson corr of
    //      the series against its own lag, pairwise-complete (both
    //      engines' corr skips NULL pairs, so the first L rows drop out
    //      per lag). The lag window is GLOBAL by construction — but over
    //      the DAILY series, whose length is bounded by the calendar
    //      (≤ 36,525 rows/century), not the 100 TB event count: the heavy
    //      lifting is the distributed groupBy(day) in front. stack()
    //      unpivots the 7 coefficients; the oracle spells the same thing
    //      as 7 UNION ALL arms (dialect intersection). ----
    QueryDef("q81_acf",
      """WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS c
        |               FROM events GROUP BY 1),
        |lagged AS (SELECT c,
        |    lag(c, 1) OVER (ORDER BY d) AS c1, lag(c, 2) OVER (ORDER BY d) AS c2,
        |    lag(c, 3) OVER (ORDER BY d) AS c3, lag(c, 4) OVER (ORDER BY d) AS c4,
        |    lag(c, 5) OVER (ORDER BY d) AS c5, lag(c, 6) OVER (ORDER BY d) AS c6,
        |    lag(c, 7) OVER (ORDER BY d) AS c7
        |  FROM daily)
        |SELECT lag_k, round(acf, 6) AS acf, n_pairs FROM (
        |  SELECT 1 AS lag_k, corr(c, c1) AS acf, count(c1) AS n_pairs FROM lagged
        |  UNION ALL SELECT 2, corr(c, c2), count(c2) FROM lagged
        |  UNION ALL SELECT 3, corr(c, c3), count(c3) FROM lagged
        |  UNION ALL SELECT 4, corr(c, c4), count(c4) FROM lagged
        |  UNION ALL SELECT 5, corr(c, c5), count(c5) FROM lagged
        |  UNION ALL SELECT 6, corr(c, c6), count(c6) FROM lagged
        |  UNION ALL SELECT 7, corr(c, c7), count(c7) FROM lagged) t
        |ORDER BY lag_k""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("d")
      val lagged = daily.select(col("c") +:
        (1 to 7).map(l => lag(col("c"), l).over(w).as(s"c$l")): _*)
      val aggCols = (1 to 7).flatMap(l => Seq(
        corr(col("c"), col(s"c$l")).as(s"acf$l"),
        count(col(s"c$l")).as(s"n$l")))
      val acfs = lagged.agg(aggCols.head, aggCols.tail: _*)
      acfs.select(expr(
          "stack(7, " + (1 to 7).map(l => s"$l, acf$l, n$l").mkString(", ") +
          ") AS (lag_k, acf, n_pairs)"))
        .select(col("lag_k"), round(col("acf"), 6).as("acf"), col("n_pairs"))
        .orderBy("lag_k")
    },

    // ---- calendar-bucket rollup + epoch round-trip — the parity pin for
    //      the events `ts` physical type. The testdata has shipped ts as
    //      TIMESTAMP(NANOS) and as naive TIMESTAMP(µs) across
    //      generations (the r7 regen broke every events query until
    //      Tables.events learned to dispatch on the read dtype); this
    //      query grades the full normalization surface — epoch micros
    //      (unix_micros vs epoch_us), ISO week numbering, and quarter
    //      arithmetic — so a future storage-type change flips a
    //      CORRECTNESS row instead of silently skewing every time bucket.
    //      Note (yr, iso_week) is intentionally the raw pair: an ISO week
    //      straddling Jan 1 splits across calendar years IDENTICALLY in
    //      both engines (both implement ISO-8601 week numbers). ----
    QueryDef("q90_ts_calendar",
      """SELECT CAST(year(ts) AS INTEGER) AS yr,
        |  CAST(quarter(ts) AS INTEGER) AS qtr,
        |  CAST(weekofyear(ts) AS INTEGER) AS iso_week,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_us(ts)) AS first_us,
        |  max(epoch_us(ts)) AS last_us
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(year(col("ts")).as("yr"), quarter(col("ts")).as("qtr"),
          weekofyear(col("ts")).as("iso_week"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
        .orderBy("yr", "qtr", "iso_week")
    },

    // ---- classical seasonal decomposition of the daily event-count
    //      series: trend = centered 7-row moving average (full windows
    //      only), seasonal = per-weekday mean of the detrended values,
    //      remainder = what's left — the additive decompose behind every
    //      "is Monday really different?" question, and the natural next
    //      step after q81's ACF finds a weekly lag. The trend window is
    //      GLOBAL like q81's — bounded by the calendar (≤36,525 rows per
    //      century), not the event count; the distributed work is the
    //      groupBy(day) in front. Cross-engine determinism: trend =
    //      (exact integer window sum)/7.0; seasonal means go through a
    //      DECIMAL(18,8) sum (order-invariant) before the double divide;
    //      weekday via Spark `weekday` == DuckDB `isodow − 1` (0=Mon). ----
    QueryDef("q91_seasonal_decompose",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS c
        |               FROM events GROUP BY 1),
        |t AS (SELECT day, c,
        |        CAST(sum(c) OVER w AS DOUBLE) / 7.0 AS trend,
        |        count(*) OVER w AS n7
        |      FROM daily
        |      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT day, c, trend, c - trend AS detr,
        |        CAST(isodow(day) - 1 AS INTEGER) AS dow
        |      FROM t WHERE n7 = 7),
        |s AS (SELECT dow,
        |        CAST(sum(CAST(detr AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS seas
        |      FROM d GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, c AS n_events,
        |  round(trend, 6) AS trend,
        |  round(seas, 6) AS seasonal,
        |  round(detr - seas, 6) AS remainder
        |FROM d JOIN s USING (dow)
        |ORDER BY day""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      val d = daily
        .withColumn("trend", sum(col("c")).over(w).cast("double") / lit(7.0))
        .withColumn("n7", count(lit(1)).over(w))
        .filter(col("n7") === 7)
        .withColumn("detr", col("c") - col("trend"))
        .withColumn("dow", weekday(col("day")))
      val seas = d.groupBy("dow")
        .agg((sum(col("detr").cast("decimal(18,8)")).cast("double") /
          count(lit(1))).as("seas"))
      d.join(broadcast(seas), "dow")
        .select(dayStr(col("day")).as("day"), col("c").as("n_events"),
          round(col("trend"), 6).as("trend"),
          round(col("seas"), 6).as("seasonal"),
          round(col("detr") - col("seas"), 6).as("remainder"))
        .orderBy("day")
    },

    // ---- LINEAR interpolation of interior gaps over the per-user daily
    //      spine (pandas `.interpolate` on a resampled series) — q34's
    //      forward fill holds the last value flat; this draws the line
    //      between the surrounding observations:
    //      `prev + (next − prev) · Δprev / Δspan`. The previous/next
    //      anchors come from IGNORE NULLS window folds; the anchor DAY
    //      rides a CASE that is null exactly when the value is, so both
    //      windows pick the same row by construction. Boundary nulls stay
    //      null (interpolation, never extrapolation). Per-user window
    //      partitions, spine bounded by the calendar — q34's scale
    //      posture unchanged. ----
    QueryDef("q94_linear_interp",
      """WITH e AS (SELECT * FROM events WHERE user_id < 10),
        |bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM e),
        |keys AS (SELECT DISTINCT user_id FROM e),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM keys, bounds),
        |daily AS (SELECT user_id, CAST(ts AS DATE) AS day, round(avg(value), 4) AS day_avg
        |          FROM e GROUP BY 1, 2),
        |j AS (SELECT s.user_id, s.day, d.day_avg
        |      FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day),
        |w AS (SELECT user_id, day, day_avg,
        |    last_value(day_avg IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN day_avg IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd,
        |    first_value(day_avg IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN day_avg IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nd
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wf AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  round(CASE
        |    WHEN day_avg IS NOT NULL THEN day_avg
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      pv + (nv - pv) * datediff('day', pd, day) / datediff('day', pd, nd)
        |    ELSE NULL END, 6) AS interp
        |FROM w ORDER BY user_id, day""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).filter(col("user_id") < 10)
      val daily = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(avg(col("value")), 4).as("day_avg"))
      val j = TimeSeries.dailySpine(e, col("user_id"), to_date(col("ts")))
        .withColumnRenamed("k", "user_id")
        .join(daily, Seq("user_id", "day"), "left")
      val wp = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
      j.withColumn("pv", last(col("day_avg"), ignoreNulls = true).over(wp))
        .withColumn("pd",
          last(when(col("day_avg").isNotNull, col("day")), true).over(wp))
        .withColumn("nv", first(col("day_avg"), ignoreNulls = true).over(wf))
        .withColumn("nd",
          first(when(col("day_avg").isNotNull, col("day")), true).over(wf))
        .select(col("user_id"), dayStr(col("day")).as("day"),
          round(when(col("day_avg").isNotNull, col("day_avg"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                datediff(col("day"), col("pd")) /
                datediff(col("nd"), col("pd"))), 6).as("interp"))
        .orderBy("user_id", "day")
    },

    // ---- truncated exponential smoothing (EWMA) per event type: the
    //      recency-weighted sibling of q37's flat 7-day window and q91's
    //      centered trend. The sequential EWMA recurrence is truncated at
    //      a 13-day lookback (error < 0.7¹⁴ ≈ 7e-3 of one term) which
    //      turns it into TimeSeries.ewmaSmooth's BANDED SELF-JOIN — pure
    //      (key, bin) equi-join with constant fan-out, never a per-key
    //      sequential scan — with weights renormalized over the days
    //      actually present. Daily means and weighted sums both run
    //      through DECIMAL so every aggregate is order-independent;
    //      0.7^(Δ∈[0,13]) is the same libm double in both engines and the
    //      DECIMAL(28,10) term rounding absorbs any last-ulp skew. ----
    QueryDef("q103_ewma_smooth",
      s"""WITH daily AS (SELECT event_type,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS ed,
         |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS x
         |  FROM events GROUP BY 1, 2, 3),
         |j AS (SELECT a.event_type, a.day, a.x,
         |    sum(CAST(b.x * power(0.7, a.ed - b.ed) AS DECIMAL(28,10))) AS num,
         |    sum(CAST(power(0.7, a.ed - b.ed) AS DECIMAL(28,10))) AS den
         |  FROM daily a JOIN daily b ON a.event_type = b.event_type
         |    AND b.ed BETWEEN a.ed - 13 AND a.ed
         |  GROUP BY 1, 2, 3)
         |SELECT event_type, day, ${graft.ops.Prep.floorToSql("x", 6)} AS x,
         |  ${graft.ops.Prep.floorToSql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)} AS ewma
         |FROM j ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("ed"))
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("x"))
      TimeSeries.ewmaSmooth(daily,
          key = "event_type", ed = "ed", x = "x", decay = 0.7, lookback = 13)
        // `day` is a pure function of `ed` - reconstructed, not carried
        .withColumn("day",
          dayStr(date_add(lit("2024-01-01").cast("date"), col("ed").cast("int"))))
        .select(col("event_type"), col("day"),
          graft.ops.Prep.floorTo(col("x"), 6).as("x"),
          graft.ops.Prep.floorTo(col("ewma"), 6).as("ewma"))
        .orderBy("event_type", "day")
    },

    // ---- rolling 7-day Pearson correlation between the click and
    //      purchase daily-count series — the co-movement monitor (q37's
    //      window frame + q97's moment algebra composed). Daily counts
    //      are INTEGERS, so every windowed moment (n, Σx, Σy, Σxy, Σx²,
    //      Σy²) is exact with no decimal detour and the closed-form r is
    //      one fixed IEEE chain. Windows with zero variance on either
    //      leg (incl. the n=1 leading edge) yield NULL, not a 0/0 NaN.
    QueryDef("q107_rolling_corr",
      s"""WITH daily AS (SELECT
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS ed,
         |    strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |    count(*) FILTER (WHERE event_type = 'click') AS x,
         |    count(*) FILTER (WHERE event_type = 'purchase') AS y
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT day,
         |    count(*) OVER w AS n,
         |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         |    sum(x * y) OVER w AS sxy,
         |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
         |  FROM daily
         |  WINDOW w AS (ORDER BY ed RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT day,
         |  CAST(n AS BIGINT) AS n_days,
         |  ${graft.ops.Prep.floorToSql(
             """CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
               |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
               |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               |             * CAST(n * syy - sy * sy AS DOUBLE))
               |    ELSE NULL END""".stripMargin, 4)} AS r
         |FROM m ORDER BY day""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("ed"),
          dayStr(col("ts")).as("day"))
        .agg(count(when(col("event_type") === "click", 1)).as("x"),
          count(when(col("event_type") === "purchase", 1)).as("y"))
      val w = Window.orderBy("ed").rangeBetween(-6, 0)
      val m = daily.select(col("day"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.select(col("day"), col("n").cast("long").as("n_days"),
          graft.ops.Prep.floorTo(
            when(vx > 0 && vy > 0,
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt(vx.cast("double") * vy.cast("double"))), 4).as("r"))
        .orderBy("day")
    },

    // ---- time-weighted average (TWAP): each observation weighted by how
    //      long it HELD — the duration to the next event in its
    //      (type, day) series — not by its row count; the standard
    //      sensor/market aggregate where sampling is irregular. Durations
    //      are exact epoch-microsecond longs from one lead() window
    //      (event_id tie-break). The weighted term is EXACT decimal x
    //      integer (value is a 2-decimal double, so its DECIMAL(18,2)
    //      form is unambiguous in both engines; dt is an integral long)
    //      - rounding the double PRODUCT to a decimal instead hit a
    //      cast-boundary divergence at sf0.001, the q65 class. The
    //      weight total stays integral. A day's last observation has no
    //      successor and drops out (open interval); single-event groups
    //      drop entirely — both engines agree by construction. ----
    QueryDef("q109_twap",
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id, value
         |           FROM events),
         |l AS (SELECT event_type, strftime(d, '%Y-%m-%d') AS day, value,
         |        epoch_us(lead(ts) OVER (PARTITION BY event_type, d
         |                                ORDER BY ts, event_id))
         |          - epoch_us(ts) AS dt
         |      FROM e),
         |g AS (SELECT event_type, day,
         |        CAST(sum(CAST(value AS DECIMAL(18,2)) * dt) AS DOUBLE) AS num,
         |        sum(dt) AS den, count(*) AS n_spans
         |      FROM l WHERE dt IS NOT NULL GROUP BY 1, 2)
         |SELECT event_type, day, CAST(n_spans AS BIGINT) AS n_spans,
         |  ${graft.ops.Prep.floorToSql("num / CAST(den AS DOUBLE)", 6)} AS twap
         |FROM g ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type"), to_date(col("ts")))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("dt",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dt").isNotNull)
        .groupBy(col("event_type"), dayStr(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)") * col("dt"))
            .cast("double").as("num"),
          sum(col("dt")).as("den"), count(lit(1)).as("n_spans"))
        .select(col("event_type"), col("day"),
          col("n_spans"),
          graft.ops.Prep.floorTo(col("num") / col("den").cast("double"), 6)
            .as("twap"))
        .orderBy("event_type", "day")
    },

    // ---- single change-point detection (binary-segmentation step,
    //      Scott & Knott / CUSUM-equivalent for a mean shift): per
    //      event_type daily-count series, find the split maximizing the
    //      between-segment sum of squares
    //      Δ(k) = (n·Sₖ − k·S)² / (k·(n−k)·n) — the k that best explains
    //      the series as two level segments. Everything up to the final
    //      division is INTEGER prefix-sum algebra (counts → Sₖ via one
    //      ordered window), so the argmax compares identical doubles in
    //      both engines (one correctly-rounded division of exact
    //      integers); ties break to the earliest day. At 100 TB the
    //      shape is: day-grain pre-agg (map-side combinable), keyed
    //      windows over the TINY day-grain table, no self-join, no
    //      quadratic split scan — the prefix-sum identity is what makes
    //      Δ(k) O(n) total instead of O(n²). ----
    QueryDef("q113_changepoint",
      s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |             count(*) AS cnt
         |           FROM events GROUP BY 1, 2),
         |p AS (SELECT event_type, day,
         |        row_number() OVER w AS k,
         |        sum(cnt) OVER (PARTITION BY event_type ORDER BY day
         |                       ROWS UNBOUNDED PRECEDING) AS sk,
         |        count(*) OVER (PARTITION BY event_type) AS n,
         |        sum(cnt) OVER (PARTITION BY event_type) AS st
         |      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |sc AS (SELECT event_type, day, k, n, sk, st,
         |         CAST((n * sk - k * st) * (n * sk - k * st) AS DOUBLE)
         |           / CAST(k * (n - k) * n AS DOUBLE) AS score
         |       FROM p WHERE k < n),
         |r AS (SELECT event_type, day, score,
         |        CAST(sk AS DOUBLE) / k AS mean_before,
         |        CAST(st - sk AS DOUBLE) / (n - k) AS mean_after,
         |        row_number() OVER (PARTITION BY event_type
         |                           ORDER BY score DESC, day) AS rn
         |      FROM sc)
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
         |  ${graft.ops.Prep.floorToSql("score", 6)} AS score,
         |  ${graft.ops.Prep.floorToSql("mean_before", 6)} AS mean_before,
         |  ${graft.ops.Prep.floorToSql("mean_after", 6)} AS mean_after
         |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.ops.TimeSeries.changepoint(daily, "event_type", "day", "cnt")
        .select(col("event_type"), dayStr(col("change_day")).as("change_day"),
          graft.ops.Prep.floorTo(col("score"), 6).as("score"),
          graft.ops.Prep.floorTo(col("mean_before"), 6).as("mean_before"),
          graft.ops.Prep.floorTo(col("mean_after"), 6).as("mean_after"))
        .orderBy("event_type")
    },
  )
}
