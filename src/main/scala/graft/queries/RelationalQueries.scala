package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Stats

/** Core relational surface: aggregation, KPI stats, star-schema joins,
  * window standardization — generalizations of the reference's operators
  * (SURVEY.md §2.3-2.7) onto the TPC-H-ish testdata.
  *
  * Float-parity notes (vs the DuckDB oracle):
  *  - Money sums go through `decimalSum`: each double term is cast to
  *    DECIMAL(18,6) before summing, making the sum exact and
  *    order-independent in BOTH engines (plain double sums differ in the
  *    last ulps because accumulation order differs), then cast back to
  *    double (exact — values fit in 2^53).
  *  - Sums/avgs of integral-valued doubles (l_quantity) are exact as-is.
  *  - stddev / z-scores are rounded to 4 decimals on both sides.
  */
object RelationalQueries {

  import Parity.decimalSum

  val all: Seq[QueryDef] = Seq(

    // ---- A1-analog: grouped hash aggregate (TPC-H Q1 pricing summary) ----
    QueryDef("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          decimalSum(col("l_extendedprice"), "sum_base_price"),
          decimalSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), "sum_disc_price"),
          decimalSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), "sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- climate_kpis analog: yearly KPI stats via Stats.kpis ----
    QueryDef("q02_kpi_by_year",
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  round(avg(l_quantity), 4) AS avg_value,
        |  round(max(l_quantity), 4) AS max_value,
        |  round(min(l_quantity), 4) AS min_value,
        |  round(stddev(l_quantity), 4) AS std_dev_value,
        |  count(*) AS record_count
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("ship_year", year(col("l_shipdate")))
        .transform(Stats.kpis(col("l_quantity"), Seq(col("ship_year"))))
        .orderBy("ship_year")
    },

    // ---- star-schema join: revenue per region (J1-J3 generalized) ----
    QueryDef("q03_star_join_revenue",
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, dir) =>
      // Fact-to-fact joins shuffle on their keys; the nation/region dims are
      // always tiny → explicit broadcast (customer is left to AQE: small
      // here, shuffle-joined at real scale).
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          decimalSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), "revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name")
    },

    // ---- W1-analog: per-partition z-score standardization ----
    QueryDef("q04_zscore_events",
      """SELECT event_id, user_id, value, round(z, 4) AS z_score
        |FROM (
        |  SELECT event_id, user_id, value,
        |    CASE WHEN std_v = 0 THEN 0.0 ELSE (value - avg_v) / std_v END AS z
        |  FROM (
        |    SELECT event_id, user_id, value,
        |      avg(value) OVER (PARTITION BY user_id) AS avg_v,
        |      stddev(value) OVER (PARTITION BY user_id) AS std_v
        |    FROM events))
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(Stats.zscore(col("value"), Seq(col("user_id"))))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("z_score"), 4).as("z_score"))
        .orderBy("event_id")
    },

    // ---- W1 skew-safe variant: same z-scores via agg+join (no window;
    //      the formulation to use when partition keys can be hot) ----
    QueryDef("q31_zscore_agg_join",
      """SELECT event_id, user_id, value, round(z, 4) AS z_score
        |FROM (
        |  SELECT event_id, user_id, value,
        |    CASE WHEN std_v = 0 THEN 0.0 ELSE (value - avg_v) / std_v END AS z
        |  FROM (
        |    SELECT event_id, user_id, value,
        |      avg(value) OVER (PARTITION BY user_id) AS avg_v,
        |      stddev(value) OVER (PARTITION BY user_id) AS std_v
        |    FROM events))
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(Stats.zscoreViaAgg(col("value"), Seq(col("user_id"))))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("z_score"), 4).as("z_score"))
        .orderBy("event_id")
    },

    // ---- P5/P7-analog: extreme-event filter + classification ----
    QueryDef("q05_extreme_events",
      """SELECT event_id, user_id, value, round(z, 4) AS z_score,
        |  CASE WHEN z > 0 THEN 'EXTREME_HIGH' ELSE 'EXTREME_LOW' END AS event_type
        |FROM (
        |  SELECT event_id, user_id, value,
        |    CASE WHEN std_v = 0 THEN 0.0 ELSE (value - avg_v) / std_v END AS z
        |  FROM (
        |    SELECT event_id, user_id, value,
        |      avg(value) OVER (PARTITION BY user_id) AS avg_v,
        |      stddev(value) OVER (PARTITION BY user_id) AS std_v
        |    FROM events))
        |WHERE abs(z) >= 2.5
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .transform(Stats.zscore(col("value"), Seq(col("user_id"))))
        .transform(Stats.extremes(col("z_score")))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("z_score"), 4).as("z_score"), col("event_type"))
        .orderBy("event_id")
    },

    // ---- TPC-H Q7-shape volume shipping: revenue flowing between two
    //      trading nations (supplier side vs customer side, BOTH
    //      directions) by ship year — the deepest join tree in the
    //      relational family: lineitem ⋈ orders co-keyed on the fact
    //      keys, supplier/customer/nation×2 all broadcast (dims), one
    //      aggregate exchange at the (nation, nation, year) grain. The
    //      nation-pair predicate rides the joined row, so Catalyst
    //      pushes each nation filter into its own broadcast build side. ----
    QueryDef("q121_volume_shipping",
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_19')
        |   OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val cn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(decimalSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
          "revenue"), count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ---- TPC-H Q8-shape market share: one supplier nation's share of a
    //      region's market for one part type, by order year. The share
    //      is a conditional DECIMAL sum over the total DECIMAL sum —
    //      both order-independent — divided once (one IEEE op, floored
    //      to 6 for display). Same join posture as Q7: facts co-keyed,
    //      every dimension broadcast. ----
    QueryDef("q122_market_share",
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_3'
         |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
         |        AS DECIMAL(18,6))) AS DOUBLE) AS nation_volume,
         |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
         |        AS DECIMAL(18,6))) AS DOUBLE) AS total_volume,
         |  ${graft.ops.Prep.floorToSql(
             """CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_3'
               | THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
               | AS DECIMAL(18,6))) AS DOUBLE) /
               | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
               | AS DECIMAL(18,6))) AS DOUBLE)""".stripMargin.replace("\n", ""),
             6)} AS mkt_share
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN part     ON l_partkey = p_partkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region   ON cn.n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE' AND p_type = (
         |  SELECT min(p_type) FROM part)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val part = Tables.part(s, dir)
      val minType = part.agg(min(col("p_type")).as("min_type"))
      val sn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val cn = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val natVol = graft.core.Exact.decimalSumExpr(
        when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0)))
      val totVol = graft.core.Exact.decimalSumExpr(vol)
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(part.join(broadcast(minType),
            col("p_type") === col("min_type"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.region(s, dir)), col("c_rk") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(natVol.as("nation_volume"), totVol.as("total_volume"),
          graft.ops.Prep.floorTo(natVol / totVol, 6).as("mkt_share"))
        .orderBy("o_year")
    },
  )
}
