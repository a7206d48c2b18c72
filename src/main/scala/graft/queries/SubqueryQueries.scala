package graft.queries

import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Correlated-subquery surface — the relational family a SQL user of the
  * engine hits daily (`WHERE EXISTS`, `NOT EXISTS`, `IN (...)`, scalar
  * aggregate subqueries), exercised THROUGH `spark.sql` over the
  * registered testdata views so Catalyst's actual decorrelation pipeline
  * fires (RewritePredicateSubquery → left-semi/anti join,
  * RewriteCorrelatedScalarSubquery → aggregate + join). q07/q08 cover the
  * already-decorrelated DataFrame forms; these are the SQL-text twins a
  * user migrating TPC-H-style queries writes verbatim.
  *
  * Scale posture (PlanSpec pins the shapes): every subquery here
  * decorrelates to a hash join — left semi (q73, q76), left anti (q75),
  * or inner against a pre-aggregated per-key subquery side (q74). None
  * plan as a per-row nested-loop re-execution, which is what makes the
  * same SQL viable on a 100 TB fact table: the subquery side shuffles
  * once on its correlation key instead of being re-run per outer row.
  *
  * Oracle parity: both engines run the IDENTICAL SQL text (dialect
  * intersection), so every constant, cast, and rounding agrees by
  * construction. q74's threshold `0.2 * avg(l_quantity)` is exact across
  * engines: l_quantity is integral-valued, so its double sum is exact in
  * any accumulation order, and avg = one IEEE division at finish in both.
  */
object SubqueryQueries {

  /** Runs the same text on Spark (after registering the testdata views)
    * and hands it to DuckDB as the oracle, so there is exactly one
    * definition of each query's semantics.
    */
  private def sqlQuery(name: String, sql: String): QueryDef =
    QueryDef(name, sql) { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(sql)
    }

  val all: Seq[QueryDef] = Seq(

    // ---- correlated EXISTS → left-semi join: orders having at least one
    //      high-value line. The filter on the subquery side pushes below
    //      the semi join, so at scale the probe side is the pre-filtered
    //      lineitem slice, not the full table. ----
    sqlQuery("q73_exists_filter",
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_extendedprice > 80000.0)
        |ORDER BY o_orderkey""".stripMargin),

    // ---- correlated scalar aggregate subquery (TPC-H Q17 shape): lines
    //      below 20% of their part's average quantity. Catalyst rewrites
    //      the per-part avg into ONE grouped aggregate over lineitem
    //      joined back on l_partkey — a single shuffle, not a per-row
    //      re-scan. ----
    sqlQuery("q74_scalar_subquery",
      """SELECT p_partkey, count(*) AS n_small,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS small_revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_partkey
        |ORDER BY p_partkey""".stripMargin),

    // ---- correlated NOT EXISTS → left-anti join: customers who never
    //      placed a top-tier order. ----
    sqlQuery("q75_not_exists",
      """SELECT c_custkey, c_mktsegment, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin),

    // ---- IN subquery → left-semi join on the DISTINCT inner keys:
    //      parts that ever shipped at near-max quantity. ----
    sqlQuery("q76_in_subquery",
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
        |                    WHERE l_quantity >= 49.0)
        |ORDER BY p_partkey""".stripMargin),

    // ---- WITH RECURSIVE (Spark 4's recursive CTE execution): bounded-
    //      depth BFS over the q63 co-purchase graph from the max-degree
    //      part — (reachable part, min hop count, path count ≤ depth 2).
    //      Each recursion level is one join-against-previous-level job;
    //      the depth bound is the termination guarantee (the level-limit
    //      conf is the backstop). The edge table is MATERIALIZED before
    //      the recursion (localCheckpoint + temp view): Spark's recursive
    //      execution re-inlines referenced CTEs per level, which re-ran
    //      the O(|lineitem|²-per-order) co-occurrence build 3× (measured
    //      9.8 s → ~2 s). DuckDB materializes CTEs, so its oracle keeps
    //      the whole pipeline as one statement — same semantics, exact
    //      integer path counts → bit parity for free. ----
    QueryDef("q77_recursive_reach",
      """WITH RECURSIVE
        |li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
        |edges AS (SELECT a.item AS src, b.item AS dst
        |          FROM li a JOIN li b ON a.g = b.g AND a.item <> b.item
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |seed AS (SELECT src AS s FROM edges
        |         GROUP BY src ORDER BY count(*) DESC, src LIMIT 1),
        |reach(node, depth) AS (
        |  SELECT s, 0 FROM seed
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1
        |  FROM reach r JOIN edges e ON e.src = r.node
        |  WHERE r.depth < 2)
        |SELECT node AS part, CAST(min(depth) AS INTEGER) AS min_depth,
        |  count(*) AS n_paths
        |FROM reach GROUP BY node ORDER BY part""".stripMargin) { (s, dir) =>
      // r16: shared memoized edge table (SharedGraph scaladoc), already
      // checkpointed — the recursion still needs the temp view
      graft.queries.SharedGraph.coEdges(s, dir)
        .createOrReplaceTempView("__q77_edges")
      s.sql(
        """WITH RECURSIVE
          |seed AS (SELECT src AS s FROM __q77_edges
          |         GROUP BY src ORDER BY count(*) DESC, src LIMIT 1),
          |reach(node, depth) AS (
          |  SELECT s, 0 FROM seed
          |  UNION ALL
          |  SELECT e.dst, r.depth + 1
          |  FROM reach r JOIN __q77_edges e ON e.src = r.node
          |  WHERE r.depth < 2)
          |SELECT node AS part, CAST(min(depth) AS INTEGER) AS min_depth,
          |  count(*) AS n_paths
          |FROM reach GROUP BY node ORDER BY part""".stripMargin)
    },

    // ---- LATERAL join with a correlated ORDER BY ... LIMIT — the SQL
    //      spelling of per-key top-k (the DataFrame twin is q19's window
    //      rank). Catalyst decorrelates the correlated LIMIT into
    //      WindowGroupLimit (map-side per-group top-k pruning BEFORE the
    //      shuffle, then again after) + a hash join — never a per-row
    //      re-execution — so on a 100 TB orders table each map task
    //      forwards at most 3 rows per customer it sees (PlanSpec pins
    //      WindowGroupLimit + absence of BNLJ). `ON true` is the lateral
    //      spelling both dialects accept. ----
    sqlQuery("q79_lateral_topk",
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t ON true
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin),

    // ---- correlated scalar subqueries in the SELECT clause (q74 covers
    //      the WHERE-clause form): per-customer max order price and order
    //      count. The count(*) arm deliberately has NO coalesce — a
    //      customer with zero orders must get 0, which is exactly the
    //      classic COUNT bug: naive outer-join decorrelation yields NULL
    //      there, and Catalyst's RewriteCorrelatedScalarSubquery patches
    //      the aggregate output specifically for it. Both subqueries
    //      decorrelate into grouped aggregates over orders LEFT-joined
    //      back on the correlation key — one shuffle per subquery, never
    //      a per-customer rescan (PlanSpec pins no-BNLJ). ----
    sqlQuery("q85_select_scalar_subquery",
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT max(o_totalprice) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin),

    // ---- named-parameter SQL binding (`spark.sql(text, args)`) — the
    //      injection-safe surface a SQL-first user actually scripts
    //      against: parameters reach Catalyst as TYPED literals (a
    //      double and a date below), never string splices, so the plan
    //      is identical to hand-inlined literals (constant folding,
    //      parquet filter pushdown — the pushed predicate shows the
    //      bound values). Oracle = the same query with the literals
    //      inlined; green iff binding neither changes types nor values.
    //      decimalSum-pattern cast on the sum (DuckDB HUGEINT trap). ----
    QueryDef("q88_param_binding",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderdate >= DATE '1995-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders
          |WHERE o_totalprice > :minPrice AND o_orderdate >= :cutoff
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("minPrice" -> 150000.0,
            "cutoff" -> java.sql.Date.valueOf("1995-01-01")))
    },

    // ---- NOT IN over a NULLABLE key — the three-valued-logic cousin of
    //      q75/q76 with genuinely different semantics: a left row whose
    //      key is NULL compares UNKNOWN against every right row, so it is
    //      dropped (here the 10 custkey-7 orders), and if the subquery
    //      produced ANY null the whole result would empty out. A plain
    //      left-anti join gets both cases wrong, so Catalyst plans the
    //      single-column null-aware anti join (BroadcastHashJoin
    //      isNullAwareAntiJoin — PlanSpec pins it, and pins that the
    //      general O(n·m) BroadcastNestedLoopJoin fallback never fires).
    //      At 100 TB: the subquery side is the broadcast build (tiny
    //      after its pushed filter); the orders probe never shuffles.
    //      decimalSum cast = the q88 HUGEINT/fold-parity pattern. ----
    sqlQuery("q89_notin_nullaware",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM orders
        |WHERE nullif(o_custkey, 7) NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal < -900.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- SQL-defined UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`) —
    //      the surface a SQL-first user extends the engine through
    //      without touching Scala. The body is a pure expression, so
    //      Catalyst INLINES it into the calling plan (no black-box UDF
    //      penalty — the plan is identical to writing the CASE by hand,
    //      which is exactly what the oracle does). ----
    QueryDef("q130_sql_udf",
      """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
        |            WHEN l_discount < 0.07 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_band(d DOUBLE)
          |RETURNS STRING
          |RETURN CASE WHEN d < 0.03 THEN 'low'
          |            WHEN d < 0.07 THEN 'mid'
          |            ELSE 'high' END""".stripMargin)
      s.sql(
        """SELECT disc_band(l_discount) AS band, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM lineitem GROUP BY 1 ORDER BY band""".stripMargin)
    },

    // ---- session variables (Spark 4 DECLARE / SET VAR) — the scripting
    //      surface for staged computations: derive a threshold once,
    //      reference it by name downstream. The variable holds a computed
    //      SCALAR (0.5·max price — exact double ops), so the consuming
    //      query's plan sees a folded literal; the oracle re-derives the
    //      same scalar with a subquery. ----
    QueryDef("q131_session_variable",
      """SELECT o_orderpriority, count(*) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice > (SELECT 0.5 * max(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("DECLARE OR REPLACE VARIABLE big_thr DOUBLE")
      s.sql("SET VAR big_thr = (SELECT 0.5 * max(o_totalprice) FROM orders)")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_big,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |WHERE o_totalprice > big_thr
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // ---- EXECUTE IMMEDIATE (dynamic SQL) — the third leg of the
    //      scripting family (q88 typed parameter binding, q131 session
    //      variables): SQL text assembled at runtime, parameters passed
    //      via USING so values reach Catalyst as TYPED literals, never
    //      string splices (the injection-safe dynamic-SQL discipline).
    //      Here the query text itself comes from a variable — the
    //      metadata-driven-report shape. ----
    QueryDef("q133_execute_immediate",
      """SELECT c_mktsegment, count(*) AS n_cust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal
        |FROM customer
        |WHERE c_acctbal > 1000.0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("DECLARE OR REPLACE VARIABLE report_sql STRING")
      s.sql(
        """SET VAR report_sql =
          |  'SELECT c_mktsegment, count(*) AS n_cust,
          |     round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal
          |   FROM customer WHERE c_acctbal > ?
          |   GROUP BY c_mktsegment ORDER BY c_mktsegment'""".stripMargin)
      s.sql("EXECUTE IMMEDIATE report_sql USING 1000.0")
    },

    // ---- INTERVAL-typed RANGE frame — the time-based sliding window a
    //      SQL user writes directly (q37 is the epoch-day arithmetic
    //      twin; q112's explode form is the COUNT(DISTINCT) workaround):
    //      a true event-time frame over the raw timestamp column, peers
    //      grouped by RANGE semantics. The window sum runs in DECIMAL so
    //      the frame arithmetic is order-independent; identical SQL text
    //      runs on both engines. ----
    sqlQuery("q136_interval_frame",
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin),

    // ---- GROUP BY ALL / ORDER BY ALL — the analyst-ergonomics syntax
    //      DuckDB popularized and Spark 4 adopted: group by every
    //      non-aggregate select item, order by every column left to
    //      right. IDENTICAL text runs on both engines, so the oracle is
    //      the query itself. ----
    sqlQuery("q138_group_by_all",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin),

    // ---- IDENTIFIER() clause — injection-safe DYNAMIC TABLE NAMES, the
    //      missing leg of the dynamic-SQL family (q88 binds values, q133
    //      binds into assembled text, this binds an identifier): the
    //      table name arrives as a typed parameter, never a string
    //      splice, so a hostile name cannot smuggle SQL. Oracle = the
    //      statically-named query (the binding must be a pure identifier
    //      substitution to hash-match). ----
    QueryDef("q139_identifier_clause",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM IDENTIFIER(:tbl) GROUP BY 1 ORDER BY 1""".stripMargin,
        Map("tbl" -> "lineitem"))
    },

    // ---- SELECT * EXCEPT — projection by exclusion (the wide-table
    //      ergonomic: drop the two heavy columns, keep the other N).
    //      The planner resolves the star minus the excluded names at
    //      analysis time, so the scan's ReadSchema prunes exactly like an
    //      explicit projection; the oracle IS that explicit projection. ----
    QueryDef("q140_star_except",
      """SELECT event_id, ts, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT * EXCEPT (value, props) FROM events
          |ORDER BY event_id""".stripMargin)
    },

    // ---- VARIANT (Spark 4's semi-structured type): build a nested JSON
    //      doc from the event columns, parse it to VARIANT, and navigate
    //      back out with typed variant_get path extraction — the
    //      shred-free JSON lakehouse surface. The ORACLE aggregates the
    //      ORIGINAL columns directly, so the hash match proves the whole
    //      to_json → parse_json → variant_get round trip preserves every
    //      value (shortest-repr double serialization makes the v sum
    //      exact; the decimal cast makes it order-free). ----
    QueryDef("q146_variant_json",
      """SELECT event_type AS etype, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS BIGINT) AS sum_k,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH v AS (
          |  SELECT parse_json(to_json(named_struct(
          |      'meta', named_struct('type', event_type,
          |        'k', CAST(get_json_object(props, '$.k') AS INT)),
          |      'v', value))) AS doc
          |  FROM events)
          |SELECT variant_get(doc, '$.meta.type', 'string') AS etype,
          |  count(*) AS n,
          |  sum(variant_get(doc, '$.meta.k', 'int')) AS sum_k,
          |  round(CAST(sum(CAST(variant_get(doc, '$.v', 'double')
          |    AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
          |FROM v GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // ---- collations (Spark 4): case-insensitive DISTINCT and equality
    //      via UTF8_LCASE on a deliberately case-mixed column — the
    //      declarative alternative to lower()-wrapping every comparison
    //      (and, unlike lower(), collation-aware comparisons keep
    //      pushdown/statistics on the original column). The oracle
    //      expresses the same semantics with lower(); binary-vs-lcase
    //      distinct counts (10 vs 5) pin that the collation actually
    //      changed equality, and the mixed-case literal match pins
    //      collated '='. ----
    QueryDef("q147_collation_lcase",
      """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
        |      THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END AS seg
        |  FROM customer)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT seg) AS BIGINT) AS n_distinct_binary,
        |  CAST(count(DISTINCT lower(seg)) AS BIGINT) AS n_distinct_lcase,
        |  CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_building
        |FROM m""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
          |      THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END AS seg
          |  FROM customer)
          |SELECT count(*) AS n_rows,
          |  count(DISTINCT seg) AS n_distinct_binary,
          |  count(DISTINCT collate(seg, 'UTF8_LCASE')) AS n_distinct_lcase,
          |  sum(CASE WHEN collate(seg, 'UTF8_LCASE') = 'Building'
          |      THEN 1 ELSE 0 END) AS n_building
          |FROM m""".stripMargin)
    },

    // ---- SQL pipe syntax (Spark 4's |> operators, SPARK-49555): the
    //      same filter→aggregate→order program written as a linear
    //      pipeline instead of inside-out SQL — each |> stage consumes
    //      the previous table. Catalyst plans it identically to the
    //      classic form (the oracle), so the hash match pins that the
    //      surface is sugar, not different semantics. ----
    QueryDef("q149_pipe_syntax",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM events WHERE value > 1
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """FROM events
          ||> WHERE value > 1
          ||> AGGREGATE count(*) AS n,
          |     round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
          |       AS total
          |   GROUP BY event_type
          ||> ORDER BY event_type""".stripMargin)
    },

    // ---- XML ingestion (Spark 4's from_xml): build an XML doc per
    //      event, parse it back with a schema, extract typed fields, and
    //      aggregate — the q146 VARIANT discipline applied to the XML
    //      surface. The oracle aggregates the ORIGINAL columns, so the
    //      hash match proves the to_xml → from_xml round trip is
    //      lossless (ints and shortest-repr doubles). ----
    QueryDef("q150_xml_roundtrip",
      """SELECT event_type AS etype, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS BIGINT) AS sum_k,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """WITH x AS (
          |  SELECT to_xml(named_struct(
          |      'type', event_type,
          |      'k', CAST(get_json_object(props, '$.k') AS INT),
          |      'v', value)) AS doc
          |  FROM events),
          |p AS (SELECT from_xml(doc,
          |        'type STRING, k INT, v DOUBLE') AS r FROM x)
          |SELECT r.type AS etype, count(*) AS n, sum(r.k) AS sum_k,
          |  round(CAST(sum(CAST(r.v AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_v
          |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)
    },
  )
}
