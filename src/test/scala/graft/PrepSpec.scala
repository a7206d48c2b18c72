package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Layout, Prep}

/** Unit/property coverage for the round-5 layout/graph/prep operators
  * (their cross-engine parity is pinned by the q61-q65 oracles; these
  * tests pin the algebraic invariants the oracles can't see).
  */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: interleaves bits (known values) and is monotone-safe in range") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (65535L, 65535L), (43690L, 21845L)).toDF("qx", "qy")
    val got = df.select(Layout.zorderKey(col("qx"), col("qy"), 16).as("z"))
      .as[Long].collect().toSeq
    // bit i of qx → position 2i+1, bit i of qy → position 2i
    assert(got == Seq(0L, 2L, 1L, 3L, 4294967295L,
      // 43690 = 0b1010101010101010 (odd positions), 21845 = 0b0101010101010101
      (0 until 16).map { i =>
        val xbit = (43690L >> i) & 1; val ybit = (21845L >> i) & 1
        (xbit << (2 * i + 1)) | (ybit << (2 * i))
      }.sum))
  }

  test("zorderKey is a bijection on the quantized grid (sampled)") {
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val keys = pts.toDF("qx", "qy")
      .select(Layout.zorderKey(col("qx"), col("qy"), 6).as("z"))
      .as[Long].collect()
    assert(keys.distinct.length == pts.length)
    assert(keys.min == 0L && keys.max == 4095L)
  }

  test("clusterByZorder: partitions hold disjoint contiguous z-ranges") {
    val df = TestSpark.spark.read.parquet(s"$sf/lineitem.parquet")
    val parts = Layout.clusterByZorder(df, "l_partkey", "l_suppkey",
        bits = 16, numPartitions = 8)
      .select(col("__zkey"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("__zkey").as("lo"), max("__zkey").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    assert(parts.nonEmpty)
    parts.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2,
        s"overlapping z-ranges across partitions: $hi1 > $lo2")
      case _ =>
    }
  }

  test("hilbertKey: exhaustive bijection + the defining adjacency property (8×8 and 16×16)") {
    for (bits <- Seq(3, 4)) {
      val n = 1 << bits
      val pts = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
      val rows = Layout.withHilbertKey(pts.toDF("qx", "qy"),
          col("qx"), col("qy"), bits, "h")
        .select("h", "qx", "qy").as[(Long, Long, Long)].collect()
      // bijection onto [0, n²)
      assert(rows.map(_._1).distinct.length == n * n)
      assert(rows.map(_._1).min == 0L && rows.map(_._1).max == (n * n - 1).toLong)
      // THE Hilbert property: consecutive keys are always grid-adjacent
      // (Manhattan distance exactly 1) — no curve seam ever jumps
      val byKey = rows.sortBy(_._1)
      byKey.sliding(2).foreach {
        case Array((_, x1, y1), (_, x2, y2)) =>
          assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
            s"Hilbert jump between ($x1,$y1) and ($x2,$y2)")
        case _ =>
      }
    }
  }

  test("hilbert beats z-order on locality: no jumps vs measured Z-seam jumps") {
    val bits = 4; val n = 1 << bits
    val pts = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val z = pts.toDF("qx", "qy")
      .select(Layout.zorderKey(col("qx"), col("qy"), bits).as("k"),
        col("qx"), col("qy"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val zJumps = z.sliding(2).count {
      case Array((_, x1, y1), (_, x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
      case _ => false
    }
    // the Z curve's seam jumps are structural (one per quadrant splice);
    // Hilbert's count is zero by the adjacency test above
    assert(zJumps > 0, "expected Z-order to have seam jumps on a full grid")
    info(s"16×16 grid: z-order seam jumps = $zJumps, hilbert = 0")
  }

  test("clusterByHilbert: partitions hold disjoint contiguous key ranges") {
    val df = TestSpark.spark.read.parquet(s"$sf/lineitem.parquet")
    val parts = Layout.clusterByHilbert(df, "l_partkey", "l_suppkey",
        bits = 8, numPartitions = 8)
      .select(col("__hkey"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("__hkey").as("lo"), max("__hkey").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    assert(parts.nonEmpty)
    parts.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2,
        s"overlapping hilbert ranges across partitions: $hi1 > $lo2")
      case _ =>
    }
  }

  test("pageRank: ranks positive and mass ≤ 1 (dangling mass drops)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 5, damping = 0.875)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 3 && r.values.forall(_ > 0))
    val mass = r.values.sum
    assert(mass > 0.99 && mass < 1.01, s"rank mass $mass")
  }

  test("pageRank: symmetric complete graph converges to uniform 1/N") {
    val nodes = 1L to 4L
    val edges = (for (a <- nodes; b <- nodes if a != b) yield (a, b)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3).as[(Long, Double)].collect()
    r.foreach { case (_, v) => assert(math.abs(v - 0.25) < 1e-12) }
  }

  test("triangleCounts: K4 has C(4,3) triangles with every node in 3; a path has none") {
    // K4, edges in one direction only — canonicalization must not care
    val nodes = 1L to 4L
    val k4 = (for (a <- nodes; b <- nodes if a < b) yield (a, b)).toDF("src", "dst")
    val r = Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r.toString)
    // the same graph with BOTH directions + self-loops changes nothing
    val noisy = (for (a <- nodes; b <- nodes) yield (a, b)).toDF("src", "dst")
    val r2 = Graph.triangleCounts(noisy).as[(Long, Long)].collect().toMap
    assert(r2 == r, r2.toString)
    // a 5-path is triangle-free → empty result
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(Graph.triangleCounts(path).count() == 0)
  }

  test("groupedMedian matches percentile_approx-free exact median, odd and even") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 100.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 10.0)).toDF("k", "v")
    val med = Prep.groupedMedian(df, Seq("k"), "v", "med")
      .as[(String, Double)].collect().toMap
    assert(med("a") == 3.0)   // odd count → middle value
    assert(med("b") == 2.5)   // even count → (a+b)/2
  }

  test("portableHash is deterministic and spreads across the 2^32 range") {
    val h = spark.range(10000)
      .select(Prep.portableHash(col("id"), col("id") + 7).as("h"))
      .as[Long].collect()
    assert(h.forall(x => x >= 0 && x < 4294967296L))
    assert(h.distinct.length > 9900) // essentially collision-free here
    val buckets = h.groupBy(_ / (4294967296L / 16)).view.mapValues(_.size)
    assert(buckets.size == 16 && buckets.values.min > 300)
  }

  test("coOccurrenceEdges: symmetric, no self-loops, distinct") {
    val df = Seq((1L, 10L), (1L, 11L), (1L, 10L), (2L, 11L), (2L, 12L))
      .toDF("g", "item")
    val e = Graph.coOccurrenceEdges(df, "g", "item").as[(Long, Long)].collect().toSet
    assert(e == Set((10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L)))
  }

  test("graft_pairs == the HOF pair chain it replaced, incl. nulls and dup values (r15 parity pin)") {
    graft.functions.GraftFunctions.register(spark)
    // arrays with nulls, duplicates, empties, singletons — the full
    // y =!= x semantics surface (null src emits nothing, null dst is
    // skipped, value-equal pairs are skipped even at different indices)
    val df = Seq(
      Seq[java.lang.Long](1L, 2L, 3L),
      Seq[java.lang.Long](5L, null, 6L, 5L),
      Seq[java.lang.Long](),
      Seq[java.lang.Long](9L),
      Seq[java.lang.Long](7L, 7L, 7L),
      Seq[java.lang.Long](null, null)
    ).toDF("items").withColumn("row_id", monotonically_increasing_id())
    val native = df.select(col("row_id"),
        explode(call_function("graft_pairs", col("items"))).as("e"))
      .select(col("row_id"), col("e.src"), col("e.dst"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val hof = df.select(col("row_id"),
        explode(flatten(transform(col("items"), x =>
          transform(filter(col("items"), y => y =!= x),
            y => struct(x.as("src"), y.as("dst")))))).as("e"))
      .select(col("row_id"), col("e.src"), col("e.dst"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(native == hof, s"native $native != hof $hof")
  }

  test("weightedSampleKey: heavy weights dominate the sample ∝ weight; deterministic") {
    // 100 items at weight 100, 900 at weight 1 → a 100-item sample should
    // be mostly heavy items (each heavy item ~100× likelier); with the
    // hash-derived uniforms the outcome is a fixed set, so the bound is
    // stable, not flaky
    val df = (0L until 1000L)
      .map(i => (i, i * 7919L, if (i < 100) 100.0 else 1.0))
      .toDF("id", "salt", "w")
    val ranked = df.withColumn("k",
        round(Prep.weightedSampleKey(col("w"), col("id"), col("salt")), 6))
      .orderBy(col("k"), col("id")).limit(100)
      .select("id").as[Long].collect()
    val heavy = ranked.count(_ < 100)
    assert(heavy >= 60, s"only $heavy/100 heavy items sampled — not ∝ weight")
    // determinism: a second evaluation yields the identical set
    val again = df.withColumn("k",
        round(Prep.weightedSampleKey(col("w"), col("id"), col("salt")), 6))
      .orderBy(col("k"), col("id")).limit(100)
      .select("id").as[Long].collect()
    assert(ranked.toSeq == again.toSeq)
  }

  test("mixtureRebalance: exact integer quotas on a skewed corpus, hash-order picks") {
    import spark.implicits._
    // source a: 6 rows at weight 2; source b: 2 rows at weight 1.
    // m = min(6 div 2, 2 div 1) = 2 → quotas a=4, b=2 — an exact 2:1 mix,
    // b fully consumed (it is the binding constraint).
    val df = ((1L to 6L).map(i => (i, "a")) ++ Seq((7L, "b"), (8L, "b")))
      .toDF("doc_id", "source")
    val got = graft.ext.TextOps.mixtureRebalance(df, col("doc_id"),
        col("source"), when(col("source") === "a", 2).otherwise(1))
      .orderBy("source", "doc").as[(Long, String, Int)].collect().toSeq
    // pick order within a source follows the Knuth multiplicative hash
    // (id·2654435761 mod 2³²): for ids 1..6 that order is 5,2,4,1,6,3 —
    // quota 4 keeps {5,2,4,1}; id 3 and 6 (hash-largest) are dropped.
    assert(got == Seq((1L, "a", 4), (2L, "a", 2), (4L, "a", 3), (5L, "a", 1),
      (7L, "b", 1), (8L, "b", 2)), s"got $got")
  }
  test("kCore: K4 survives a 3-core peel, the pendant chain peels away") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus chain 4-5-6 (both directions per edge)
    val und = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = graft.ops.Graph.kCore(edges, k = 3, rounds = 4)
      .orderBy("node").as[(Long, Int)].collect().toSeq
    // node 4's edge to the peeled 5 is gone: every survivor has deg 3
    assert(got == Seq((1L,3),(2L,3),(3L,3),(4L,3)), s"got $got")
    // k above max coreness: everything peels
    assert(graft.ops.Graph.kCore(edges, k = 4, rounds = 4).count() == 0)
  }

  test("kCore: extra rounds past the fixed point are no-ops (monotone peel)") {
    import spark.implicits._
    val und = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val at2 = graft.ops.Graph.kCore(edges, 3, 2).orderBy("node")
      .as[(Long, Int)].collect().toSeq
    val at8 = graft.ops.Graph.kCore(edges, 3, 8).orderBy("node")
      .as[(Long, Int)].collect().toSeq
    assert(at2 == at8, s"$at2 vs $at8")
  }

  test("labelPropagation: two triangles bridged by one edge keep distinct communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} + bridge 3-4: majority voting inside
    // each triangle beats the single bridge vote — communities stay
    // separate where connected components would merge them
    val und = Seq((1L,2L),(1L,3L),(2L,3L),(4L,5L),(4L,6L),(5L,6L),(3L,4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = graft.ops.Graph.labelPropagation(edges, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toMap
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(4L, 5L, 6L).map(got)
    assert(left.size == 1 && right.size == 1, s"got $got")
    assert(left != right, s"bridge merged the communities: $got")
    // while connectedComponents DOES merge them — the structural contrast
    val comp = graft.ext.Dedup.connectedComponents(
        edges.select(col("src").as("id_a"), col("dst").as("id_b")),
        col("id_a"), col("id_b"))
      .select("component").distinct().count()
    assert(comp == 1L)
  }

  test("rankViaBuckets == global row_number, asc and desc, heavy ties across buckets") {
    import org.apache.spark.sql.expressions.Window
    // l_quantity has ~50 distinct values vs 64 buckets — most buckets
    // hold exactly one tie class, several are empty, and every tie class
    // spans many rows: the exact adversarial regime for a bucketed rank
    // (a tie split across two buckets would double-count a prior).
    val df = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_quantity").as("v"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
    for (asc <- Seq(true, false)) {
      val w =
        if (asc) Window.orderBy(col("v").asc, col("id").asc)
        else Window.orderBy(col("v").desc, col("id").asc)
      // compare the rank-ordered (v, id) sequences — the synthetic
      // lineitem contains fully-duplicated rows, so a (v, id) join would
      // cross-match the arbitrary-but-harmless tie order between
      // IDENTICAL tuples; the ordered sequence is invariant to it
      val expect = df.withColumn("r", row_number().over(w).cast("long"))
        .orderBy("r").select("v", "id").collect().toSeq
      val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
          ascending = asc, rankCol = "r")
        .orderBy("r").select("v", "id").collect().toSeq
      assert(expect == got, s"asc=$asc: rank order diverges")
    }
  }

  test("rankViaBuckets(partitionKeys) == keyed row_number — the 5-value-skew case") {
    import org.apache.spark.sql.expressions.Window
    // l_returnflag has 3 values: the skewed-partition regime where a
    // plain keyed window is a 3-task sort of the table
    val df = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"), col("l_quantity").as("v"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .orderBy("g", "r").select("g", "v", "id").collect().toSeq
    val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
        rankCol = "r", partitionKeys = Seq(col("g")))
      .orderBy("g", "r").select("g", "v", "id").collect().toSeq
    assert(want == got)
  }

  test("runningTotalsViaBuckets == unpartitioned running sums, inclusive and prior frames, two weights") {
    import org.apache.spark.sql.expressions.Window
    // the q93 shape: value-grain table with two integer weight columns
    val c = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "error"))
      .groupBy("value")
      .agg(count(when(col("event_type") === "click", 1)).as("ca"),
        count(when(col("event_type") === "error", 1)).as("cb"))
    for (inclusive <- Seq(true, false)) {
      val end = if (inclusive) 0L else -1L
      val w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, end)
      val want = c
        .withColumn("wa", coalesce(sum(col("ca")).over(w), lit(0L)))
        .withColumn("wb", coalesce(sum(col("cb")).over(w), lit(0L)))
      val got = graft.ops.Prep.runningTotalsViaBuckets(c, col("value"),
        Seq("ca" -> "ga", "cb" -> "gb"), inclusive = inclusive)
      val bad = want.join(got, Seq("value", "ca", "cb"))
        .filter(col("wa") =!= col("ga") || col("wb") =!= col("gb")).count()
      assert(bad == 0L, s"inclusive=$inclusive: $bad values diverge")
    }
  }

  test("rankViaBuckets(splitTies) == global row_number, asc and desc, on a tie-heavy value") {
    import org.apache.spark.sql.expressions.Window
    // the q145 regime: the rank VALUE has a handful of distinct values
    // (per-key counts), so value-only buckets collapse to that handful
    // and the in-bucket window degenerates toward one task; splitTies'
    // (value, tie) pair edges must spread the tied mass WITHOUT changing
    // a single rank
    val df = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").as("id"))
      .agg(count(lit(1)).as("v"))
    for (asc <- Seq(true, false)) {
      val w =
        if (asc) Window.orderBy(col("v").asc, col("id").asc)
        else Window.orderBy(col("v").desc, col("id").asc)
      val expect = df.withColumn("r", row_number().over(w).cast("long"))
        .orderBy("r").select("v", "id").collect().toSeq
      val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
          ascending = asc, rankCol = "r", splitTies = true)
        .orderBy("r").select("v", "id").collect().toSeq
      assert(expect == got, s"asc=$asc: splitTies rank order diverges")
    }
    // and combined with partitionKeys — q145's exact shape
    val grouped = df.withColumn("g", (col("id") % 3).cast("string"))
    val wg = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val want = grouped.withColumn("r", row_number().over(wg).cast("long"))
      .orderBy("g", "r").select("g", "v", "id").collect().toSeq
    val got = graft.ops.Prep.rankViaBuckets(grouped, col("v"), col("id"),
        rankCol = "r", partitionKeys = Seq(col("g")), splitTies = true)
      .orderBy("g", "r").select("g", "v", "id").collect().toSeq
    assert(want == got, "splitTies + partitionKeys diverges from the keyed window")
  }

  test("rankViaBuckets(autoSplitBudget): derived activation fires on an oversized tie cell, never moves a rank") {
    import org.apache.spark.sql.expressions.Window
    // q145's regime again: per-key counts (a handful of distinct values)
    val df = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").as("id"))
      .agg(count(lit(1)).as("v"))
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expect = df.withColumn("r", row_number().over(w).cast("long"))
      .orderBy("r").select("v", "id").collect().toSeq
    // budget 1: EVERY cell oversized → the pair-edge switch must fire,
    // and ranks must be bit-identical to the global window anyway
    val fired = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
        rankCol = "r", autoSplitBudget = 1L)
      .orderBy("r").select("v", "id").collect().toSeq
    assert(expect == fired, "auto-fired tie split changed a rank")
    // huge budget: predicate must NOT fire; output equals value-only form
    val unfired = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
        rankCol = "r", autoSplitBudget = Long.MaxValue)
      .orderBy("r").select("v", "id").collect().toSeq
    assert(expect == unfired)
    // grouped form (q145's exact shape): fired and unfired agree with the
    // keyed window
    val grouped = df.withColumn("g", (col("id") % 3).cast("string"))
    val wg = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val want = grouped.withColumn("r", row_number().over(wg).cast("long"))
      .orderBy("g", "r").select("g", "v", "id").collect().toSeq
    for (budget <- Seq(1L, Long.MaxValue)) {
      val got = graft.ops.Prep.rankViaBuckets(grouped, col("v"), col("id"),
          rankCol = "r", partitionKeys = Seq(col("g")),
          autoSplitBudget = budget)
        .orderBy("g", "r").select("g", "v", "id").collect().toSeq
      assert(want == got, s"budget=$budget: grouped auto split diverges")
    }
  }

  test("rankViaBuckets: ranks are a permutation of 1..n even with few distinct values") {
    import spark.implicits._
    // 7 distinct values, 64 requested buckets → sketch edges collapse to
    // duplicates; priors must still tile 1..n exactly
    val df = (1 to 500).map(i => (i % 7, i.toLong)).toDF("v", "id")
    val ranks = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
        rankCol = "r")
      .select("r").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 500L).toSeq)
  }

  test("rankViaBuckets: NaN rows rank exactly where the global window puts them (above every real)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // NaN would silently bucket-0 under a bare `v > edge` predicate while
    // the sort sends it last — the r12 advice finding. The fix pins NaN
    // to the top bucket; this asserts full parity with the global window
    // in both directions.
    val df = (1 to 300).map { i =>
      val v = if (i % 29 == 0) Double.NaN else (i % 13).toDouble
      (v, i.toLong)
    }.toDF("v", "id")
    for (asc <- Seq(true, false)) {
      val w =
        if (asc) Window.orderBy(col("v").asc, col("id").asc)
        else Window.orderBy(col("v").desc, col("id").asc)
      val want = df.withColumn("r", row_number().over(w).cast("long"))
        .orderBy("r").select("id").as[Long].collect().toSeq
      val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
          ascending = asc, rankCol = "r")
        .orderBy("r").select("id").as[Long].collect().toSeq
      assert(want == got, s"asc=$asc: NaN rows misplaced")
    }
  }

  test("rankViaBuckets(partitionKeys): null, empty-string and separator-bearing keys stay distinct groups") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // Pre-fix, concat_ws skipped nulls so a null-key group and an
    // empty-string group shared one prior-map entry while the window
    // partitioned them apart. The netstring encoding must keep all four
    // adversarial groups (null, empty, the separator char itself, and a
    // key containing it) independent.
    val keys = Seq(null, "", "\u0001", "a\u0001b")
    val df = (1 to 400).map { i =>
      (keys(i % 4), (i % 11).toDouble, i.toLong)
    }.toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("r", row_number().over(w).cast("long"))
    val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
      rankCol = "r2", partitionKeys = Seq(col("g")))
    val bad = want.join(got, Seq("id"))
      .filter(col("r") =!= col("r2")).count()
    assert(bad == 0L, s"$bad rows rank differently from the keyed window")
  }
}
