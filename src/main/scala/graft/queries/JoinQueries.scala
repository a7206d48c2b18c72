package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import Parity._

/** The full join family + set operations + grouping sets — the
  * generalized surface SURVEY.md §2.5/§2.6/§2.8 calls for (the reference
  * itself uses only cross + equi joins; the rest are engine capabilities
  * a user of the reference's data would reach for next).
  *
  * Scale notes: every fact-to-fact join here shuffles on its key (sort-merge
  * at real scale, AQE-broadcast at test scale); dimension sides
  * (region/nation) are explicitly broadcast. Set ops are shuffles on the
  * full row — at 100 TB prefer keyed except/intersect via anti/semi joins,
  * which is exactly how these are expressed below.
  */
object JoinQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- left outer join with residual condition + null-aware counts ----
    QueryDef("q06_left_join_agg",
      """SELECT o_orderstatus,
        |  count(*) AS n_rows,
        |  count(l_orderkey) AS n_matched
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey AND l_quantity > 45.0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey") && col("l_quantity") > 45.0,
          "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
             count(col("l_orderkey")).as("n_matched"))
        .orderBy("o_orderstatus")
    },

    // ---- left semi join (EXISTS) ----
    QueryDef("q07_semi_join",
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },

    // ---- left anti join (NOT EXISTS) ----
    QueryDef("q08_anti_join",
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },

    // ---- cross join (the reference's fact-build J1) ----
    QueryDef("q09_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")
    },

    // ---- full outer join over pre-aggregated sides ----
    QueryDef("q10_full_outer_join",
      """SELECT coalesce(c.k, s.k) AS n_nationkey, n_cust, n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.k = s.k
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val p = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("n_nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy("n_nationkey")
    },

    // ---- distinct aggregates (exact) ----
    QueryDef("q11_count_distinct",
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
             countDistinct(col("l_partkey")).as("n_parts"),
             count(lit(1)).as("n_lines"))
        .orderBy("ship_year")
    },

    // ---- rollup with grouping flags ('ALL' instead of NULL so ordering
    //      and hashing are null-free on both engines) ----
    QueryDef("q12_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
        |  coalesce(l_linestatus, 'ALL') AS line_status,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY return_flag, line_status""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
             grouping(col("l_linestatus")).cast("int").as("g_status"),
             sum(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("return_flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy("return_flag", "line_status")
    },

    // ---- cube ----
    QueryDef("q13_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS order_status,
        |  coalesce(o_orderpriority, 'ALL') AS order_priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY order_status, order_priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             decimalSum(col("o_totalprice"), "total_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("order_status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("order_priority"),
          col("n"), col("total_price"))
        .orderBy("order_status", "order_priority")
    },

    // ---- explicit grouping sets (the general form behind rollup/cube):
    //      (flag, status) detail, (flag) subtotal, () grand total — one
    //      Expand + single partial+final aggregate, same one exchange ----
    QueryDef("q36_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
        |  coalesce(l_linestatus, 'ALL') AS line_status,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY return_flag, line_status, g_flag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq.empty[org.apache.spark.sql.Column]),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
             grouping(col("l_linestatus")).cast("int").as("g_status"),
             sum(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("return_flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
          col("g_flag"), col("g_status"), col("sum_qty"), col("n"))
        .orderBy("return_flag", "line_status", "g_flag")
    },

    // ---- set ops: UNION (distinct), INTERSECT, EXCEPT ----
    QueryDef("q14_union",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      a.union(b).distinct().orderBy("c_custkey")
    },

    QueryDef("q15_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      a.intersect(b).orderBy("c_custkey")
    },

    QueryDef("q16_except",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy("c_custkey")
    },

    // ---- multiset set ops (INTERSECT ALL / EXCEPT ALL): q15/q16 keep
    //      DISTINCT semantics; these keep MULTIPLICITY — per month,
    //      min(#urgent, #high) matched order pairs survive INTERSECT ALL
    //      and the urgent surplus survives EXCEPT ALL, which no distinct
    //      set op can express. Spark plans both as one hash aggregate
    //      per side + a join on the counts (no row replication shuffle
    //      beyond the grouped counts), so multiplicity handling is
    //      aggregate-shaped, scale-safe. The post-aggregation makes the
    //      multiset observable (and the output deterministic). ----
    QueryDef("q80_multiset_ops",
      """WITH a AS (SELECT CAST(month(o_orderdate) AS INTEGER) AS m
        |           FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT CAST(month(o_orderdate) AS INTEGER) AS m
        |      FROM orders WHERE o_orderpriority = '2-HIGH')
        |SELECT 'intersect_all' AS op, m, count(*) AS n
        |FROM (SELECT m FROM a INTERSECT ALL SELECT m FROM b) ia GROUP BY m
        |UNION ALL
        |SELECT 'except_all' AS op, m, count(*) AS n
        |FROM (SELECT m FROM a EXCEPT ALL SELECT m FROM b) ea GROUP BY m
        |ORDER BY op, m""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      def bag(prio: String) = orders.filter(col("o_orderpriority") === prio)
        .select(month(col("o_orderdate")).cast("int").as("m"))
      val a = bag("1-URGENT"); val b = bag("2-HIGH")
      val ia = a.intersectAll(b).groupBy("m").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("m"), col("n"))
      val ea = a.exceptAll(b).groupBy("m").agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("m"), col("n"))
      ia.unionByName(ea).orderBy("op", "m")
    },

    // ---- null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL join
    //      keys MATCH each other — the semantics a plain equi join
    //      silently drops (NULL = NULL is NULL, the rows vanish). The
    //      nullable key is manufactured with nullif so the NULL bucket
    //      actually exists; Spark plans EqualNullSafe as a real hash-join
    //      key (coalesced), never a nested loop (PlanSpec pins it). ----
    QueryDef("q78_nullsafe_join",
      """WITH a AS (SELECT nullif(user_id % 7, 3) AS k, count(*) AS n_events
        |           FROM events GROUP BY 1),
        |b AS (SELECT nullif(u % 7, 3) AS k, count(*) AS n_users
        |      FROM (SELECT DISTINCT user_id AS u FROM events) GROUP BY 1)
        |SELECT a.k, n_events, n_users
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS LAST""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val a = ev.groupBy(nullif(col("user_id") % 7, lit(3)).as("k"))
        .agg(count(lit(1)).as("n_events"))
      val b = ev.select(col("user_id").as("u")).distinct()
        .groupBy(nullif(col("u") % 7, lit(3)).as("k"))
        .agg(count(lit(1)).as("n_users"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k"), col("n_events"), col("n_users"))
        .orderBy(a("k").asc_nulls_last)
    },
  )
}
