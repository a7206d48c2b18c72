package graft

import org.apache.spark.sql.functions._
import graft.ops.{Maintenance, Skew}
import graft.ext.Similarity

/** Semantics of the table-maintenance operators (ops/Maintenance.scala),
  * the salted join (ops/Skew.scala), and the greedy embedding dedup
  * (ext/Similarity.cosineDedup) on crafted inputs where the expected
  * result is hand-checkable. The sf-data oracle parity for the q46-q51 /
  * s06 query forms is the driver's DuckDB gate; these tests pin the
  * operator CONTRACTS (replacement not patching, exactly-one-current,
  * salt-invariance) that the oracle alone can't distinguish.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: matched keys replaced, unmatched kept, new keys inserted") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "amount")
    val updates = Seq((2L, "B2", 99.0), (9L, "new", 1.0))
      .toDF("k", "status", "amount")
    val out = Maintenance.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, "a", 10.0),   // unmatched target kept
      (2L, "B2", 99.0),  // matched: full-row replacement
      (3L, "c", 30.0),
      (9L, "new", 1.0))) // unmatched update inserted
  }

  test("upsert with multi-column key matches on the full key") {
    val target = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val updates = Seq((1L, "y", 20.0)).toDF("k1", "k2", "v")
    val out = Maintenance.upsert(target, updates, Seq("k1", "k2"))
      .orderBy("k1", "k2").as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq((1L, "x", 1.0), (1L, "y", 20.0)))
  }

  test("scd2: contiguous intervals, exactly one open row per key") {
    val log = Seq(
      (7L, "2024-01-01", "bronze"),
      (7L, "2024-03-01", "silver"),
      (7L, "2024-02-01", "bronze+"), // out of order in the input
      (8L, "2024-05-01", "gold"))
      .toDF("k", "eff", "tier")
      .withColumn("eff", to_date(col("eff")))
    val out = Maintenance.scd2(log, Seq("k"), "eff", Seq("tier"))
      .select(col("k"), col("tier"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .orderBy("k", "valid_from")
      .as[(Long, String, String, String, Int)].collect()
    assert(out.toSeq === Seq(
      (7L, "bronze", "2024-01-01", "2024-02-01", 0),
      (7L, "bronze+", "2024-02-01", "2024-03-01", 0),
      (7L, "silver", "2024-03-01", null, 1),
      (8L, "gold", "2024-05-01", null, 1)))
    // exactly one current row per key, however many versions
    val perKey = out.groupBy(_._1).view.mapValues(_.count(_._5 == 1)).toMap
    assert(perKey.values.forall(_ == 1))
  }

  test("latestPerKey: one row per key, the max under the given order") {
    val log = Seq(
      (1L, 10L, "old"), (1L, 30L, "newest"), (1L, 20L, "mid"),
      (2L, 5L, "only"))
      .toDF("k", "ver", "payload")
    val out = Maintenance.latestPerKey(log, Seq(col("k")),
        Seq(col("ver").desc))
      .orderBy("k").as[(Long, Long, String)].collect()
    assert(out.toSeq === Seq((1L, 30L, "newest"), (2L, 5L, "only")))
  }

  test("saltedJoin == plain join on data with one hot key") {
    // 900 of 1000 left rows share key 42 — the salting target
    val left = spark.range(1000)
      .select(when(col("id") < 900, 42L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = spark.range(100).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("attr"))
    val plain = left.join(right, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Skew.saltedJoin(left, right, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(salted.orderBy("k").collect().toSeq ===
      plain.orderBy("k").collect().toSeq)
  }

  test("cosineDedup: lower id survives an identical pair; dissimilar all kept") {
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(2.0f, 0.0f, 0.0f)),  // same direction as 10 → dropped
      (13L, Array(0.0f, -1.0f, 0.0f)), // anti-parallel to 11 → kept
      (14L, Array(0.0f, 1.0f, 1e-6f))) // ~parallel to 11 → dropped
      .toDF("vec_id", "embedding")
    val kept = Similarity.cosineDedup(vecs, "vec_id", "embedding",
        lit(true), threshold = 0.95)
      .orderBy("v_id").as[Long].collect()
    assert(kept.toSeq === Seq(10L, 11L, 13L))
  }

  test("cosineDedup is idempotent: re-running on survivors drops nothing") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 1e-4f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1e-4f, 1.0f)))
      .toDF("vec_id", "embedding")
    val once = Similarity.cosineDedup(vecs, "vec_id", "embedding",
      lit(true), threshold = 0.99)
    val survivors = vecs.join(once, vecs("vec_id") === once("v_id"), "left_semi")
    val twice = Similarity.cosineDedup(survivors, "vec_id", "embedding",
      lit(true), threshold = 0.99)
    assert(once.count() === twice.count())
    assert(once.orderBy("v_id").as[Long].collect().toSeq === Seq(1L, 3L))
  }

  test("applyCdc: deletes vanish, updates replace, inserts land, missing-key delete is a no-op") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      (2L, "b2", 21.0, "U"),   // replace
      (3L, "c", 30.0, "D"),    // delete
      (4L, "d", 40.0, "I"),    // insert
      (9L, "?", 0.0, "D")      // delete of a key not in target — no-op
    ).toDF("k", "v", "x", "op")
    val got = Maintenance.applyCdc(target, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
    // idempotent for I/U (deletes already gone): re-applying the non-D
    // subset changes nothing
    val again = Maintenance.applyCdc(
      Maintenance.applyCdc(target, changes, Seq("k")),
      changes.filter(col("op") =!= "D"), Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(again == got)
  }

  test("observedQuality: metrics ride the action — no second pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "v")
    val (observed, obs) = Maintenance.observedQuality(df, "dq", Seq("v", "id"))
    // ONE sort-free action: a global orderBy would run the range-sampling
    // pass over the input first and the observe node would count twice —
    // exactly the double-scan observedQuality exists to avoid
    val rows = observed.as[(Long, Option[String])].collect().toSeq.sortBy(_._1)
    assert(rows ==
      Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None)))
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("nulls_v") == 2L)
    assert(m("nulls_id") == 0L)
  }
  test("snapshotDiff: added/removed/changed/unchanged + per-column flags, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "x", Some(1.0)), (2L, "y", Some(2.0)),
      (3L, "z", None: Option[Double]), (4L, "w", Some(4.0)))
      .toDF("k", "s", "v")
    val b = Seq((1L, "x", Some(1.0)),            // unchanged
      (2L, "y2", Some(2.0)),                     // changed: s only
      (3L, "z", Some(3.0)),                      // changed: NULL -> value (null-safe)
      (5L, "new", Some(5.0)))                    // added; 4 removed
      .toDF("k", "s", "v")
    val got = graft.ops.Maintenance.snapshotDiff(a, b, Seq("k"))
      .orderBy("k").select("k", "status", "chg_s", "chg_v")
      .as[(Long, String, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged", false, false),
      (2L, "changed", true, false),
      (3L, "changed", false, true),
      (4L, "removed", true, true),    // vs-NULL compares: all flags true on removed
      (5L, "added", true, true)), s"got $got")
  }

  test("snapshotDiff rejects mismatched schemas") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.ops.Maintenance.snapshotDiff(a, b, Seq("k"))
    }
  }

  test("tableProfile: nulls, exact distincts, typed min/max on a hand fixture") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")), (None, Some("y")),
      (Some(3L), None), (Some(3L), Some("y"))).toDF("a", "s")
    val got = graft.ops.Maintenance
      .tableProfile(df, numericCols = Seq("a"), stringCols = Seq("s"))
      .orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7)))).toSeq
    assert(got == Seq(
      ("a", 4L, 1L, 2L, Some(1.0), Some(3.0), None, None),
      ("s", 4L, 1L, 2L, None, None, Some("x"), Some("y"))))
  }

  test("tableProfile is ONE scan: a single agg feeds the stack generator") {
    import spark.implicits._
    val df = graft.core.Tables.lineitem(spark, sf)
    val plan = graft.ops.Maintenance.tableProfile(df,
        numericCols = Seq("l_orderkey", "l_quantity"),
        stringCols = Seq("l_returnflag"))
      .queryExecution.executedPlan.toString
    // one parquet scan, no union of per-column jobs
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Union"), plan)
  }

  test("changelogDiff: correct event fan-out; applying the log rebuilds B") {
    import spark.implicits._
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "v")
    val b = Seq((1L, "x", 10.0), (2L, "y2", 21.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val log = Maintenance.changelogDiff(a, b, Seq("k"))
    val got = log.orderBy("k", "op")
      .as[(String, Long, String, Double)].collect().toSeq
    // unchanged key 1 emits nothing; '+' sorts before '-'
    assert(got == Seq(
      ("+U", 2L, "y2", 21.0), ("-U", 2L, "y", 20.0),
      ("-D", 3L, "z", 30.0), ("+I", 4L, "w", 40.0)))
    // round trip: the log is applyCdc's input format modulo the
    // old-value rows — strip -U, map +I/-D/+U to I/D/U, apply → B
    val cdc = log.filter(col("op") =!= "-U")
      .withColumn("op", expr("substring(op, 2, 1)"))
    val rebuilt = Maintenance.applyCdc(a, cdc, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(rebuilt == b.as[(Long, String, Double)].collect().toSet)
  }

  test("compactionPlan: hand-packed bins (size-desc greedy, DIV boundary)") {
    import spark.implicits._
    // files 5,4,3,2 at target 7: cumulative-before 0,5,9,12 → bins 0,0,1,1
    val inv = Seq(("x", 1L, 5L), ("x", 2L, 4L), ("x", 3L, 3L), ("x", 4L, 2L))
      .toDF("part", "file_id", "bytes")
    val got = Maintenance.compactionPlan(inv, targetBytes = 7L)
      .orderBy("bin").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("x", 0L, 2L, 9L), ("x", 1L, 2L, 5L)))
    // a second partition plans independently
    val two = inv.union(Seq(("y", 1L, 20L)).toDF("part", "file_id", "bytes"))
    assert(Maintenance.compactionPlan(two, 7L).count() == 3)
  }

  test("keySkewProfile: hand-computed gini/skew on a 3-key distribution") {
    import spark.implicits._
    // counts {1:3, 2:1, 3:1} → asc ranks (2,1),(3,1),(1,3) → Σi·c = 12;
    // gini = (2·12 − 4·5)/(3·5) = 4/15; skew = 3·3/5 = 1.8; top key 1
    val keyed = Seq(1L, 1L, 1L, 2L, 3L).map(("ka", _)).toDF("col_name", "k")
    val r = Maintenance.keySkewProfile(keyed).collect().head
    assert(r.getAs[Long]("n_keys") == 3 && r.getAs[Long]("n_rows") == 5)
    assert(r.getAs[Long]("max_count") == 3 && r.getAs[Long]("top_key") == 1L)
    assert(r.getAs[Double]("skew_ratio") == 1.8)
    assert(math.abs(r.getAs[Double]("gini") - 4.0 / 15) < 1e-6)
    // uniform distribution → gini 0
    val uni = Seq(1L, 2L, 3L, 4L).map(("kb", _)).toDF("col_name", "k")
    assert(Maintenance.keySkewProfile(uni).collect().head
      .getAs[Double]("gini") == 0.0)
  }

  test("keySkewProfile: string keys — top_key exact, ties break to smallest key") {
    import spark.implicits._
    // 'b' and 'a' tie at count 2 → top_key must be 'a' (smallest), and a
    // non-numeric key must never silently null out under the tie-break
    val keyed = Seq("b", "b", "a", "a", "z").map(("kc", _)).toDF("col_name", "k")
    val r = Maintenance.keySkewProfile(keyed).collect().head
    assert(r.getAs[String]("top_key") == "a", r.toString)
    assert(r.getAs[Long]("max_count") == 2L)
  }

  test("changelogDiff: key-only snapshots emit +I/-D and never throw") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(2L, 3L).toDF("k")
    val log = Maintenance.changelogDiff(a, b, Seq("k"))
      .select("op", "k").as[(String, Long)].collect().toSet
    assert(log == Set(("-D", 1L), ("+I", 3L)), log.toString)
  }
}
