package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The SQL entry point: Tables.registerAll + spark.sql must give results
  * identical to the DataFrame registry (same Catalyst underneath), so a
  * SQL-first user of the engine gets the exact same answers.
  */
class SqlSpec extends SparkSpec {

  test("spark.sql over registered views == DataFrame queries") {
    Tables.registerAll(spark, sf)

    val sqlTopK = spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    val dfTopK = SparkEntry.queries("q18_topk_orders")(spark, sf)
    assert(sqlTopK.collect().toSeq == dfTopK.collect().toSeq)

    val sqlAgg = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    val dfAgg = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
    assert(sqlAgg.collect().toSeq == dfAgg.collect().toSeq)
  }

  test("spark.sql window/qualify form == Maintenance.latestPerKey (q49)") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
    val viaDf = graft.ops.Maintenance.latestPerKey(Tables.events(spark, sf),
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id").orderBy("user_id")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("spark.sql sees the nanos-normalized events view") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql("SELECT min(ts) AS lo FROM events").collect()(0)
    val viaDf = Tables.events(spark, sf).agg(min(col("ts")).as("lo")).collect()(0)
    assert(viaSql == viaDf)
  }

  test("engine functions are SQL-callable: graft_dot and the graft_wmean UDAF") {
    Tables.registerAll(spark, sf)
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT l_returnflag,
        |  round(graft_wmean(CAST(l_extendedprice AS DECIMAL(15,2)),
        |                    CAST(l_quantity AS DECIMAL(15,2))), 6) AS wavg_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    val viaDf = SparkEntry.queries("q67_weighted_mean_udaf")(spark, sf)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0)
    assert(dot.getDouble(0) == 11.0)
  }

  test("parameterized SQL: named parameters bind as literals, matching the DataFrame filter") {
    // the injection-safe surface a SQL-first user templates with —
    // parameters must reach Catalyst as typed literals, not string splices
    Tables.registerAll(spark, sf)
    val viaParams = spark.sql(
      """SELECT count(*) AS n FROM orders
        |WHERE o_totalprice > :minPrice AND o_orderpriority = :prio""".stripMargin,
      Map("minPrice" -> 300000.0, "prio" -> "1-URGENT"))
      .collect()(0).getLong(0)
    val viaDf = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000.0 &&
        col("o_orderpriority") === "1-URGENT").count()
    assert(viaParams == viaDf && viaDf > 0)
  }

  test("correlated count(*) scalar subquery yields 0, not NULL, on empty groups (COUNT bug)") {
    // the q85 shape with the edge the testdata lacks (every sf0.01
    // customer has orders): decorrelation must patch the aggregate output
    // for the key with NO matching rows — naive outer-join rewrite gives
    // NULL, the correct scalar-subquery answer is 0
    import spark.implicits._
    Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "seg")
      .createOrReplaceTempView("cb_cust")
    Seq((10L, 1L), (11L, 1L)).toDF("o_orderkey", "o_custkey")
      .createOrReplaceTempView("cb_ord")
    val rows = spark.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM cb_ord o WHERE o.o_custkey = c.c_custkey) AS n
        |FROM cb_cust c ORDER BY c_custkey""".stripMargin).collect()
    assert(!rows.exists(_.isNullAt(1)), "COUNT bug: empty group produced NULL")
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (2L, 0L)))
  }

  test("SQL UDF (CREATE FUNCTION ... RETURN expr) inlines — no black-box UDF node") {
    val sess = spark.newSession()
    graft.core.Tables.registerAll(sess, sf)
    sess.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION tri(x DOUBLE) RETURNS STRING
        |RETURN CASE WHEN x < 0.03 THEN 'lo' ELSE 'hi' END""".stripMargin)
    val df = sess.sql(
      "SELECT tri(l_discount) AS b, count(*) AS n FROM lineitem GROUP BY 1")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("CASE WHEN"), plan) // body inlined as expressions
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // inlined == hand-written: identical results
    val hand = sess.sql(
      """SELECT CASE WHEN l_discount < 0.03 THEN 'lo' ELSE 'hi' END AS b,
        |count(*) AS n FROM lineitem GROUP BY 1""".stripMargin)
    assert(df.orderBy("b").collect().toSeq == hand.orderBy("b").collect().toSeq)
  }

  test("session variable (DECLARE/SET VAR) folds to the computed scalar") {
    val sess = spark.newSession()
    graft.core.Tables.registerAll(sess, sf)
    sess.sql("DECLARE OR REPLACE VARIABLE thr DOUBLE")
    sess.sql("SET VAR thr = (SELECT max(o_totalprice) FROM orders)")
    val mx = sess.sql("SELECT max(o_totalprice) FROM orders").head().getDouble(0)
    val n = sess.sql("SELECT count(*) AS n FROM orders WHERE o_totalprice >= thr")
      .head().getLong(0)
    val nHand = sess.sql(
      s"SELECT count(*) AS n FROM orders WHERE o_totalprice >= $mx")
      .head().getLong(0)
    assert(n == nHand && n >= 1)
  }
}
