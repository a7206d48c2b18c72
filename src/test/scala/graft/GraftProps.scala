package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.{Parse, Stats}
import graft.pipeline.Climate

/** Property-based tests (SURVEY.md §5): z-score invariants, parse
  * round-trips, injection branch order — raw ScalaCheck Properties (the
  * scalatest bridge isn't on the classpath; sbt runs these natively).
  * minSuccessfulTests is kept small: each case is a real Spark job.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val valuesGen: Gen[List[Double]] =
    Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0).map(v => math.rint(v * 100) / 100)))

  property("zscore: per-partition mean ~0 and stddev ~1 when non-degenerate") =
    forAll(valuesGen) { vs =>
      val distinct = vs.distinct.size > 1
      val df = vs.map(("k", _)).toDF("k", "v")
      val z = Stats.zscore(col("v"), Seq(col("k")))(df)
        .select("z_score").as[Double].collect()
      if (!distinct) Prop(z.forall(_ == 0.0)) :| "degenerate -> all zero"
      else {
        val mean = z.sum / z.length
        val sd = math.sqrt(z.map(x => (x - mean) * (x - mean)).sum / (z.length - 1))
        Prop(math.abs(mean) < 1e-9 && math.abs(sd - 1.0) < 1e-9) :|
          s"mean=$mean sd=$sd"
      }
    }

  private val kvGen: Gen[List[(Long, Double)]] =
    Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 6L) // small key space forces matched/unmatched mix
      v <- Gen.choose(-100.0, 100.0).map(x => math.rint(x * 100) / 100)
    } yield (k, v)))

  property("upsert: |result| = |updates| + |target \\ update-keys|; idempotent") =
    forAll(kvGen, kvGen) { (t, u) =>
      // key-unique frames (the upsert contract)
      val target = t.distinctBy(_._1).toDF("k", "v")
      val updates = u.distinctBy(_._1).toDF("k", "v")
      val once = graft.ops.Maintenance.upsert(target, updates, Seq("k"))
      val updKeys = u.map(_._1).toSet
      val expected = u.distinctBy(_._1).size +
        t.distinctBy(_._1).count(r => !updKeys.contains(r._1))
      val onceRows = once.orderBy("k", "v").collect().toSeq
      val twiceRows = graft.ops.Maintenance.upsert(once, updates, Seq("k"))
        .orderBy("k", "v").collect().toSeq
      Prop(onceRows.size == expected) :| s"count ${onceRows.size} != $expected" &&
        Prop(onceRows == twiceRows) :| "not idempotent"
    }

  property("latestPerKey picks exactly the per-key max under the order") =
    forAll(kvGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "seq")
      val out = graft.ops.Maintenance.latestPerKey(df,
          Seq(col("k")), Seq(col("seq").desc))
        .select("k", "seq").as[(Long, Long)].collect().toMap
      val expected = rows.zipWithIndex.groupBy(_._1._1)
        .view.mapValues(_.map(_._2.toLong).max).toMap
      Prop(out == expected) :| s"$out != $expected"
    }

  private val berkeleyRow: Gen[(Int, Int, Int, Double)] = for {
    y <- Gen.choose(1900, 2030)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    a <- Gen.choose(-5.0, 5.0).map(v => math.rint(v * 1000) / 1000)
  } yield (y, m, d, a)

  property("berkeley 6-token format round-trips through the parser") =
    forAll(Gen.nonEmptyListOf(berkeleyRow)) { rows =>
      val text = rows.map { case (y, m, d, a) =>
        String.format(java.util.Locale.ROOT,
          "  %d.123  %d  %2d  %2d  42  %.3f", y, y, m, d, a)
      }
      val df = text.toDF("value")
      val parsed = Climate.berkeleySilver(df)
        .select("year", "month", "day", "anomaly")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          r.getFloat(3).toDouble))
      val expected = rows.map { case (y, m, d, a) => (y, m, d, a.toFloat.toDouble) }
      Prop(parsed.toList.sorted == expected.sorted) :|
        s"parsed=${parsed.take(3).toList} expected=${expected.take(3)}"
    }

  property("malformed berkeley lines never survive the parser") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.const("% comment line"),
      Gen.const(""),                                // empty line (ANSI trap)
      Gen.const("  2001  1"),                       // short
      Gen.alphaStr.map(s => s"  x.$s  YEAR  1  1  1  0.5"),  // bad year
    ))) { lines =>
      val df = (lines :+ "  2000.1  2000   1   1   1  0.500").toDF("value")
      val n = Climate.berkeleySilver(df).count()
      Prop(n == 1L) :| s"survivors=$n"
    }

  property("injection: noise is +/-15 on hash buckets, else in (-2,2); %25 wins") =
    forAll(Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))) { keys =>
      val df = keys.distinct.map((_, 2001, 6)).toDF("station_id", "year", "month")
      import graft.ops.Anomaly
      val cols = Seq(col("station_id"), col("year"), col("month"))
      val out = Anomaly.deterministicNoise(cols)(df)
        .transform(Anomaly.injectExtremes(cols))
        .withColumn("h", abs(hash(cols: _*)))
        .select(col("local_noise"), col("h") % 25 === 0, col("h") % 27 === 0)
        .collect()
      Prop(out.forall { r =>
        val (noise, m25, m27) = (r.getDouble(0), r.getBoolean(1), r.getBoolean(2))
        if (m25) noise == 15.0
        else if (m27) noise == -15.0
        else noise > -2.0 && noise < 2.0
      }) :| "branch order / ranges"
    }

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 8).flatMap(n => Gen.sequence[List[(Long, String)], (Long, String)](
      (1 to n).map(i => Gen.choose(3, 15).flatMap(w =>
        Gen.listOfN(w, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
          .map(ws => (i.toLong, ws.mkString(" ")))))))

  property("jaccardPairs: values in [0,1], symmetric by construction (id_a < id_b)") =
    forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val pairs = graft.ext.Dedup.jaccardPairs(df, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      Prop(pairs.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 }) :|
        s"pairs=${pairs.take(3).toList}"
    }

  property("minhash LSH candidates are a superset of exact-duplicate pairs") =
    forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      // exact dup pairs (identical text, both with >= 3 words)
      val dups = for {
        (a, ta) <- docs; (b, tb) <- docs
        if a < b && ta == tb && ta.split(" ").length >= 3
      } yield (a, b)
      val cands = graft.ext.Dedup.lshCandidates(df, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Prop(dups.forall(cands.contains)) :|
        s"missing=${dups.filterNot(cands.contains).take(3)}"
    }

  property("crossPrefixProbe == brute-force cross pairs at τ=2/5 on random corpora") =
    forAll(docsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val batch = df.filter(col("doc_id") % 2 === 1)
      val corpus = df.filter(col("doc_id") % 2 === 0)
      val cSh = graft.ext.Dedup.shingleHashTable(corpus, col("doc_id"), col("text"))
      val got = graft.ext.Dedup.crossPrefixProbe(
          graft.ext.Dedup.shingleHashTable(batch, col("doc_id"), col("text")),
          graft.ext.Dedup.prefixIndexTable(cSh, tauNum = 2, tauDen = 5),
          graft.ext.Dedup.signatureTable(cSh), tauNum = 2, tauDen = 5,
          broadcastSigs = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val all: Set[(Long, Long)] = graft.ext.Dedup.jaccardPairs(df, col("doc_id"), col("text"))
        .filter(col("jaccard") >= 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = all
        .filter { case (a, b) => a % 2 != b % 2 }
        .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }
      Prop(got == brute) :| s"missing=${brute -- got} extra=${got -- brute}"
    }

  property("dupSpanStats: covered_words/n_spans == brute-force word-coverage union") =
    forAll(docsGen) { docs =>
      val n = 2
      // driver-side truth: word position j of doc d is covered iff some
      // cross-doc-duplicated gram starting at i has i <= j <= i+n-1
      val words = docs.map { case (d, t) => d -> t.split("\\s+").toList }.toMap
      val grams = docs.map { case (d, t) =>
        d -> words(d).sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      }.toMap
      val docsOfGram = grams.toList.flatMap { case (d, gs) => gs.distinct.map(_ -> d) }
        .groupBy(_._1).map { case (g, ds) => g -> ds.map(_._2).distinct.size }
      val truth = grams.map { case (d, gs) =>
        val cov = gs.zipWithIndex.collect {
          case (g, idx) if docsOfGram(g) >= 2 => (idx + 1) to (idx + n)
        }.flatten.toSet
        val spans = if (cov.isEmpty) 0
          else cov.toList.sorted.foldLeft((0, Int.MinValue)) {
            case ((k, prev), j) => (if (j == prev + 1) k else k + 1, j)
          }._1
        d -> (cov.size.toLong, spans)
      }
      val got = graft.ext.Dedup.dupSpanStats(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n = n)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("covered_words"), r.getAs[Int]("n_spans"))).toMap
      val eligible = truth.filter { case (d, _) => words(d).size >= n }
      Prop(eligible.forall { case (d, t) => got.get(d).contains(t) } &&
        got.keySet == eligible.keySet) :|
        s"got=$got truth=$eligible"
    }

  property("movingAvg stays within [min,max] of its trailing window") =
    forAll(valuesGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v")
      val got = Stats.movingAvg(col("v"), Seq(col("t")), n = 3)(df)
        .orderBy("t").select("moving_avg").as[Double].collect()
      val ok = got.zipWithIndex.forall { case (m, i) =>
        val win = vs.slice(math.max(0, i - 2), i + 1)
        m >= win.min - 1e-9 && m <= win.max + 1e-9
      }
      Prop(ok) :| s"got=${got.toList.take(5)}"
    }

  // DSv2 pushdown soundness: under ANY random id band, the pruned scan
  // returns exactly the rows a full scan + filter would — pruning is an
  // optimization, never the semantics (filters stay residual)
  property("graft-synthetic DSv2: random range filters always exact under pruning") =
    forAll(Gen.chooseNum(0L, 999L), Gen.chooseNum(0L, 999L)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val df = spark.read.format("graft-synthetic")
        .option("rows", "1000").option("partitions", "7").load()
      val pruned = df.filter(col("id") >= lo && col("id") < hi)
      val expected = math.max(0L, hi - lo)
      Prop(pruned.count() == expected) :| s"[$lo,$hi): got ${pruned.count()}"
    }

  // applyCdc cardinality law: |result| = |target \ touched| + |non-D changes|
  property("applyCdc: cardinality law holds for arbitrary I/U/D batches") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 40L)).map(_.distinct),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 60L), Gen.oneOf("I", "U", "D")))
        .map(_.distinctBy(_._1))) { (targetKeys, changes) =>
      val target = targetKeys.map(k => (k, s"t$k")).toDF("k", "v")
      val ch = changes.map { case (k, op) => (k, s"c$k", op) }.toDF("k", "v", "op")
      val got = graft.ops.Maintenance.applyCdc(target, ch, Seq("k")).count()
      val touched = changes.map(_._1).toSet
      val expected = targetKeys.count(!touched.contains(_)) +
        changes.count(_._2 != "D")
      Prop(got == expected) :| s"got $got want $expected"
    }

  // applyCdc idempotence: re-applying the same key-unique batch is a no-op
  // (the at-least-once-delivery law a CDC consumer relies on — a replayed
  // batch re-upserts identical rows and re-deletes already-absent keys)
  property("applyCdc: applying the same batch twice == once") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 40L)).map(_.distinct),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 60L), Gen.oneOf("I", "U", "D")))
        .map(_.distinctBy(_._1))) { (targetKeys, changes) =>
      val target = targetKeys.map(k => (k, s"t$k")).toDF("k", "v")
      val ch = changes.map { case (k, op) => (k, s"c$k", op) }.toDF("k", "v", "op")
      val once = graft.ops.Maintenance.applyCdc(target, ch, Seq("k"))
      val twice = graft.ops.Maintenance.applyCdc(once, ch, Seq("k"))
      val a = once.as[(Long, String)].collect().toSet
      val b = twice.as[(Long, String)].collect().toSet
      Prop(a == b) :| s"once=${a.take(3)} twice=${b.take(3)}"
    }

  // applyCdc ordering law: applying two batches in version order ==
  // compacting their union to the latest row per key (latestPerKey) and
  // applying once — the contract that makes multi-batch catch-up safe for
  // an out-of-order CDC consumer (compact by op version FIRST, then apply)
  property("applyCdc: sequential batches == latestPerKey-compacted single apply") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 30L)).map(_.distinct),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 45L), Gen.oneOf("I", "U", "D")))
        .map(_.distinctBy(_._1)),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 45L), Gen.oneOf("I", "U", "D")))
        .map(_.distinctBy(_._1))) { (targetKeys, b1, b2) =>
      val target = targetKeys.map(k => (k, s"t$k")).toDF("k", "v")
      val ch1 = b1.map { case (k, op) => (k, s"a$k", op, 1L) }.toDF("k", "v", "op", "ver")
      val ch2 = b2.map { case (k, op) => (k, s"b$k", op, 2L) }.toDF("k", "v", "op", "ver")
      val sequential = graft.ops.Maintenance.applyCdc(
        graft.ops.Maintenance.applyCdc(target, ch1.drop("ver"), Seq("k")),
        ch2.drop("ver"), Seq("k"))
      val compacted = graft.ops.Maintenance.latestPerKey(
        ch1.unionByName(ch2), Seq(col("k")), Seq(col("ver").desc))
      val oneShot = graft.ops.Maintenance.applyCdc(
        target, compacted.drop("ver"), Seq("k"))
      val a = sequential.as[(Long, String)].collect().toSet
      val b = oneShot.as[(Long, String)].collect().toSet
      Prop(a == b) :| s"seq=${a.take(3)} one=${b.take(3)}"
    }

  // int8 quantization guarantee: |x − code·scale| ≤ scale/2 per element
  // (round-to-nearest with the max element hitting ±127 exactly), codes
  // clamped to [−127, 127] — over arbitrary float vectors incl. negatives
  private val vecGen = Gen.nonEmptyListOf(
    Gen.chooseNum(-1e6f, 1e6f)).map(_.take(32))
  property("int8Quantize: reconstruction error ≤ scale/2, codes in [-127,127]") =
    forAll(Gen.nonEmptyListOf(vecGen).map(_.take(8))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val rows = graft.ext.Similarity.int8Quantize(df, "vec_id", "embedding")
        .select(col("vid"), col("v"), col("scale"), col("codes"))
        .as[(Long, Seq[Double], Double, Seq[Int])].collect()
      val ok = rows.forall { case (_, v, scale, codes) =>
        codes.forall(c => c >= -127 && c <= 127) &&
          v.zip(codes).forall { case (x, c) =>
            math.abs(x - c * scale) <= scale / 2 + 1e-9 * math.max(1.0, scale)
          }
      }
      Prop(ok) :| s"first=${rows.headOption.map(r => (r._3, r._4.take(4)))}"
    }

  // multiset partition law behind q80: INTERSECT ALL and EXCEPT ALL split
  // the left bag exactly — per element, min(na, nb) + max(na − nb, 0) = na
  // — so the two results together ARE the left input (as a multiset),
  // over arbitrary bags with arbitrary duplicate structure
  // hashing-trick vectorizer: no token is lost or invented (Σn == token
  // count) and every bucket lands in [0, buckets) — over arbitrary docs
  // incl. empty/whitespace-only ones
  private val docGen: Gen[String] = Gen.listOf(
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))).map(_.mkString(" "))
  property("hashedFeatures conserves token mass; buckets in range") =
    forAll(Gen.nonEmptyListOf(docGen).map(_.take(6))) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val feats = graft.ext.TextOps.hashedFeatures(df, "doc_id", "text", 64)
        .as[(Long, Int, Long)].collect()
      val expectedTokens = docs.map(
        _.toLowerCase.trim.split("\\s+").count(_.nonEmpty)).sum
      val ok = feats.map(_._3).sum == expectedTokens &&
        feats.forall(f => f._2 >= 0 && f._2 < 64)
      Prop(ok) :| s"sum=${feats.map(_._3).sum} expected=$expectedTokens"
    }

  private val bagGen = Gen.listOf(Gen.choose(0, 5))
  property("intersectAll + exceptAll partition the left multiset exactly") =
    forAll(bagGen, bagGen) { (as, bs) =>
      val a = as.toDF("m")
      val b = bs.toDF("m")
      val together = a.intersectAll(b).unionAll(a.exceptAll(b))
        .groupBy("m").count().as[(Int, Long)].collect().toMap
      val expected = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
      Prop(together == expected) :| s"got=$together expected=$expected"
    }

  // random small directed edge lists over ≤12 nodes (self-loops and
  // duplicates included on purpose — triangleCounts must canonicalize)
  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.choose(2, 12).flatMap { n =>
      Gen.choose(0, 26).flatMap(m => Gen.listOfN(m, for {
        s <- Gen.choose(0L, (n - 1).toLong)
        d <- Gen.choose(0L, (n - 1).toLong)
      } yield (s, d)))
    }

  private def bruteTriangles(es: List[(Long, Long)]): Map[Long, Long] = {
    val und = es.collect { case (s, d) if s != d =>
      (math.min(s, d), math.max(s, d)) }.toSet
    val nodes = und.flatMap(e => Set(e._1, e._2)).toList.sorted
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      tri <- nodes.combinations(3)
      Seq(x, y, z) = tri
      if und((x, y)) && und((x, z)) && und((y, z))
    } { acc(x) += 1; acc(y) += 1; acc(z) += 1 }
    acc.toMap
  }

  property("triangleCounts == brute-force all-triples on ≤12 nodes") =
    forAll(edgesGen) { es =>
      val got = graft.ops.Graph.triangleCounts(es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val expected = bruteTriangles(es)
      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("triangleCounts invariant to edge direction + duplication") =
    forAll(edgesGen) { es =>
      val base = graft.ops.Graph.triangleCounts(es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // flip every other edge, then append a reversed copy of half the
      // list — the undirected canonicalization must absorb both
      val mangled = es.zipWithIndex.map { case ((s, d), i) =>
        if (i % 2 == 0) (d, s) else (s, d)
      } ++ es.take(es.size / 2).map { case (s, d) => (d, s) }
      val got = graft.ops.Graph.triangleCounts(mangled.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      Prop(got == base) :| s"mangled=$got base=$base"
    }

  property("triangleCounts id-range guard raises on negative/oversized ids") =
    forAll(Gen.oneOf(-1L, -5L, 100000000L, 7000000000L)) { bad =>
      val df = Seq((bad, 1L), (1L, 2L), (2L, bad)).toDF("src", "dst")
      Prop(scala.util.Try(
        graft.ops.Graph.triangleCounts(df).collect()).isFailure) :|
        s"id $bad must raise"
    }
  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 8L); b <- Gen.choose(0L, 8L) if a != b
    } yield (a, b)))

  property("kCore: nested cores — (k+1)-core ⊆ k-core; 1-core = all non-isolated nodes") =
    forAll(graphGen) { es =>
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
      def core(k: Int): Set[Long] = graft.ops.Graph.kCore(edges, k, rounds = 9)
        .select("node").as[Long].collect().toSet
      val (c1, c2, c3) = (core(1), core(2), core(3))
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSet
      Prop(c3.subsetOf(c2) && c2.subsetOf(c1) && c1 == nodes) :|
        s"c1=$c1 c2=$c2 c3=$c3 nodes=$nodes"
    }

  property("snapshotDiff: diff(a, a) is all-unchanged; statuses partition the key space") =
    forAll(kvGen, kvGen) { (t, u) =>
      val a = t.distinctBy(_._1).toDF("k", "v")
      val b = u.distinctBy(_._1).toDF("k", "v")
      val self = graft.ops.Maintenance.snapshotDiff(a, a, Seq("k"))
        .select("status").as[String].collect()
      val d = graft.ops.Maintenance.snapshotDiff(a, b, Seq("k"))
        .select("status").as[String].collect()
      val na = t.distinctBy(_._1).size
      val nb = u.distinctBy(_._1).size
      val counts = d.groupBy(identity).view.mapValues(_.length).toMap
        .withDefaultValue(0)
      // every A key is removed/changed/unchanged; every B key is
      // added/changed/unchanged — so the totals reconstruct both sides
      val aSide = counts("removed") + counts("changed") + counts("unchanged")
      val bSide = counts("added") + counts("changed") + counts("unchanged")
      Prop(self.forall(_ == "unchanged") && aSide == na && bSide == nb) :|
        s"self=${self.toSet} counts=$counts na=$na nb=$nb"
    }

  property("mannWhitneyU: U1 + U2 = n_a·n_b and swapping samples negates z") =
    forAll(kvGen) { kvs =>
      if (kvs.size < 2) Prop.passed
      else {
        // split alternately into two labeled samples; values may tie
        val df = kvs.zipWithIndex
          .map { case ((_, v), i) => (if (i % 2 == 0) "a" else "b", v) }
          .toDF("g", "v")
        val hasB = kvs.size >= 2
        val r = graft.ops.Stats.mannWhitneyU(df,
            col("g") === "a", col("g") === "b", col("v"))
          .select("n_a", "n_b", "u1", "u2", "z")
          .as[(Long, Long, Double, Double, Double)].collect().head
        val sw = graft.ops.Stats.mannWhitneyU(df,
            col("g") === "b", col("g") === "a", col("v"))
          .select("z").as[Double].collect().head
        Prop(hasB && r._3 + r._4 == r._1.toDouble * r._2 &&
          (r._5.isNaN && sw.isNaN || math.abs(r._5 + sw) < 1e-12)) :|
          s"r=$r swapped z=$sw"
      }
    }

  private val seriesGen: Gen[List[Long]] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 50L)))

  property("changepoint: scaling counts by c scales score c^2, split day invariant") =
    forAll(seriesGen, Gen.choose(2, 5)) { (cnts, c) =>
      val base = cnts.zipWithIndex.map { case (v, i) => ("k", i, v) }
        .toDF("k", "day", "cnt")
      val scaled = cnts.zipWithIndex.map { case (v, i) => ("k", i, v * c) }
        .toDF("k", "day", "cnt")
      def run(df: org.apache.spark.sql.DataFrame) =
        graft.ops.TimeSeries.changepoint(df, "k", "day", "cnt")
          .select("change_day", "score").as[(Int, Double)].collect().head
      val (d0, s0) = run(base)
      val (d1, s1) = run(scaled)
      // Δ(k) is a ratio of exact integer products: scaling every count
      // by c multiplies both Sₖ and S by c, so the RATIONAL score scales
      // by exactly c² and the argmax cannot move (fl rounding is
      // monotone). The rounded DOUBLES differ by one ulp though —
      // fl(c²·num/den) ≠ c²·fl(num/den) — hence the relative tolerance.
      val rel = if (s0 == 0.0) math.abs(s1)
        else math.abs(s1 - s0 * c * c) / (s0 * c * c)
      Prop(d0 == d1 && rel < 1e-12) :|
        s"base=($d0,$s0) scaled=($d1,$s1) c=$c rel=$rel"
    }

  private val ptsGen: Gen[List[(Double, Double)]] =
    Gen.choose(2, 10).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 99), Gen.choose(0, 99))
        .map { case (a, b) => (a / 1000.0, b / 1000.0) }))

  property("mutualNN2d: equals brute-force reciprocal pairs when one cell covers all") =
    forAll(ptsGen) { pts =>
      // points confined to [0, 0.1)² with cellSize 1.0 → every pair is a
      // candidate, so the grid op must equal plain brute force under the
      // same (rounded dist², id) tie order
      val df = pts.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, Array(x.toFloat, y.toFloat)) }.toDF("vec_id", "embedding")
      val got = graft.ext.Similarity.mutualNN2d(df, "vec_id", "embedding",
          cellSize = 1.0)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val xs = pts.map { case (x, y) => (x.toFloat.toDouble, y.toFloat.toDouble) }
      def d2(i: Int, j: Int): Double = {
        val (xi, yi) = xs(i); val (xj, yj) = xs(j)
        // Spark's round(x, 6) semantics (BigDecimal HALF_UP), not rint —
        // the two differ off the obvious .5 boundary via x*1e6 FP error
        BigDecimal((xi - xj) * (xi - xj) + (yi - yj) * (yi - yj))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      def nn(i: Int): Option[Int] =
        xs.indices.filter(_ != i)
          .sortBy(j => (d2(i, j), j.toLong)).headOption
      val exp = (for {
        i <- xs.indices; j <- nn(i)
        if i < j && nn(j).contains(i)
      } yield (i.toLong, j.toLong)).toSet
      Prop(got == exp) :| s"got=$got exp=$exp"
    }

  private val basketsGen: Gen[List[(Int, Int)]] =
    Gen.choose(2, 8).flatMap(nb =>
      Gen.listOfN(nb * 3, Gen.zip(Gen.choose(1, nb), Gen.choose(10, 16))))

  property("basketRules: pair support bounded by item supports; lift identity holds") =
    forAll(basketsGen) { rows =>
      val df = rows.toDF("g", "item")
      val nb = rows.map(_._1).distinct.size.toLong
      val got = graft.ops.Mining.basketRules(df, "g", "item", minPairSupport = 1)
        .select("pair_n", "cnt_a", "cnt_b", "conf_a_b", "lift")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      Prop(got.forall { case (p, ca, cb, conf, lift) =>
        p <= math.min(ca, cb) && ca <= nb && cb <= nb &&
          conf == p.toDouble / ca &&
          lift == (p * nb).toDouble / (ca * cb)
      }) :| s"rows=$got nb=$nb"
    }

  private val calendarGen: Gen[List[Int]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(1, 28)))

  property("activityBitmap: popcount == active days; streak <= active <= span") =
    forAll(calendarGen) { days =>
      val df = days.map(d => (7L, f"2024-03-$d%02d 12:00:00"))
        .toDF("user_id", "s")
        .select(col("user_id"), col("s").cast("timestamp").as("ts"))
      val r = graft.ops.Mining.activityBitmap(df, "user_id", "ts")
        .select("bitmap", "active_days", "longest_streak")
        .collect().head
      val (bm, act, st) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val distinct = days.distinct.sorted
      Prop(java.lang.Long.bitCount(bm) == act && act == distinct.size &&
        st <= act && st >= 1 &&
        st <= distinct.max - distinct.min + 1) :| s"bm=$bm act=$act st=$st days=$distinct"
    }

  private val profGen: Gen[List[(Option[Long], Option[String])]] =
    Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.option(Gen.choose(-5L, 5L)),
      Gen.option(Gen.oneOf("x", "y", "z")))))

  property("tableProfile matches a driver-side profile on random null-ridden frames") =
    forAll(profGen) { rows =>
      val df = rows.toDF("a", "s")
      val got = graft.ops.Maintenance
        .tableProfile(df, numericCols = Seq("a"), stringCols = Seq("s"))
        .orderBy("col_name")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val as = rows.map(_._1)
      val ss = rows.map(_._2)
      val exp = Seq(
        ("a", rows.size.toLong, as.count(_.isEmpty).toLong,
          as.flatten.distinct.size.toLong),
        ("s", rows.size.toLong, ss.count(_.isEmpty).toLong,
          ss.flatten.distinct.size.toLong))
      Prop(got == exp) :| s"got=$got exp=$exp"
    }

  private val lpaEdgesGen: Gen[List[(Long, Long)]] =
    Gen.choose(2, 10).flatMap(n => Gen.listOfN(n * 2,
      Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 6L)).suchThat(p => p._1 != p._2)))

  property("labelPropagation: labels are member node ids; uniform edge duplication is a no-op") =
    forAll(lpaEdgesGen) { es =>
      // symmetrize (the op's contract) and run 2 rounds
      val sym = (es ++ es.map(_.swap)).distinct
      val df = sym.toDF("src", "dst")
      val got = graft.ops.Graph.labelPropagation(df, rounds = 2)
        .as[(Long, Long)].collect().toMap
      val nodes = sym.map(_._1).toSet
      val doubled = graft.ops.Graph
        .labelPropagation(df.union(df), rounds = 2)
        .as[(Long, Long)].collect().toMap
      Prop(got.keySet == nodes && got.values.toSet.subsetOf(nodes) &&
        doubled == got) :| s"got=$got doubled=$doubled"
    }

  private val keysGen: Gen[List[Long]] =
    Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 9L)))

  property("cms: est >= exact for every key; row totals == N; merge = cell-wise add") =
    forAll(keysGen) { ks =>
      val df = ks.toDF("k")
      val counters = graft.ops.Mining.cmsCounters(df, col("k"), d = 3, w = 4)
      val est = graft.ops.Mining.cmsEstimates(counters, df, d = 3, w = 4)
        .as[(Long, Long)].collect().toMap
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rowTotals = counters.groupBy("j").agg(sum("c").as("t"))
        .select("t").as[Long].collect().toSeq
      // sketch of a split input merges by cell-wise addition into the
      // whole-input sketch (the distributed-counting property)
      val (l, r) = ks.splitAt(ks.size / 2)
      val merged = graft.ops.Mining.cmsCounters(l.toDF("k"), col("k"), 3, 4)
        .unionByName(graft.ops.Mining.cmsCounters(r.toDF("k"), col("k"), 3, 4))
        .groupBy("j", "bucket").agg(sum("c").as("c"))
        .as[(Int, Long, Long)].collect().toSet
      val whole = counters.as[(Int, Long, Long)].collect().toSet
      Prop(exact.forall { case (k, c) => est(k) >= c } &&
        rowTotals.forall(_ == ks.size.toLong) &&
        merged == whole) :| s"est=$est exact=$exact"
    }

  private val snapGen: Gen[(List[(Long, String)], List[(Long, String)])] =
    for {
      a <- Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.oneOf("x", "y", "z")))
      b <- Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.oneOf("x", "y", "z")))
    } yield (a.distinctBy(_._1), b.distinctBy(_._1))

  property("changelogDiff: applying the emitted log to A always rebuilds B") =
    forAll(snapGen) { case (as, bs) =>
      val a = as.toDF("k", "s")
      val b = bs.toDF("k", "s")
      val log = graft.ops.Maintenance.changelogDiff(a, b, Seq("k"))
      val cdc = log.filter(col("op") =!= "-U")
        .withColumn("op", expr("substring(op, 2, 1)"))
      val rebuilt = graft.ops.Maintenance.applyCdc(a, cdc, Seq("k"))
        .as[(Long, String)].collect().toSet
      // event-count identity: |log| = inserts + deletes + 2·changed
      val statuses = graft.ops.Maintenance.snapshotDiff(a, b, Seq("k"))
        .groupBy("status").count().as[(String, Long)].collect().toMap
      val expected = statuses.getOrElse("added", 0L) +
        statuses.getOrElse("removed", 0L) + 2 * statuses.getOrElse("changed", 0L)
      Prop(rebuilt == bs.toSet && log.count() == expected) :|
        s"a=$as b=$bs rebuilt=$rebuilt"
    }

  // random messy-URL generator: mixed-case scheme/host, optional www.,
  // optional default port, path segments with optional trailing slash,
  // shuffled params with utm_ noise, optional fragment
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("https", "HTTPS", "Https")
    www    <- Gen.oneOf("", "www.", "WWW.")
    host   <- Gen.oneOf("Example.COM", "data.example.com", "CRAWL.example.org")
    port   <- Gen.oneOf("", ":443")
    seg    <- Gen.choose(0, 99)
    slash  <- Gen.oneOf("", "/", "//", "///") // multi-slash tails too —
    // a one-slash strip would break idempotence on these
    params <- Gen.someOf("id=1", "q=spark", "utm_source=x", "utm_medium=y",
      "page=2")
    qmark  <- Gen.oneOf("", "?") // query-less URLs must canonicalize too
    frag   <- Gen.oneOf("", "#top")
  } yield {
    val qs = if (qmark.isEmpty && params.isEmpty) ""
             else s"?${params.mkString("&")}"
    s"$scheme://$www$host$port/p/$seg$slash$qs$frag"
  }

  property("canonicalizeUrl is idempotent and strips every mess class") =
    forAll(Gen.listOfN(8, urlGen)) { urls =>
      val df = urls.toDF("url")
        .select(graft.ext.TextOps.canonicalizeUrl(col("url")).as("c1"))
        .select(col("c1"),
          graft.ext.TextOps.canonicalizeUrl(col("c1")).as("c2"))
      val rows = df.as[(String, String)].collect()
      Prop(rows.forall { case (c1, c2) =>
        c1 == c2 && c1 == c1.toLowerCase && !c1.contains("www.") &&
          !c1.contains(":443") && !c1.contains("#") && !c1.contains("utm_") &&
          !c1.stripSuffix("?").endsWith("/")
      }) :| rows.mkString("; ")
    }

  // random heavy-tie frames: few distinct values + duplicate ids exercise
  // every boundary of the bucketed-rank machinery (ties at sketch edges,
  // empty buckets, duplicate rows with identical (v, id))
  private val rankFrameGen: Gen[List[(Double, Long)]] = for {
    n       <- Gen.choose(5, 60)
    nvals   <- Gen.choose(1, 6)
    vals    <- Gen.listOfN(nvals, Gen.choose(-50.0, 50.0).map(v => math.rint(v * 10) / 10))
    rows    <- Gen.listOfN(n, for {
      v  <- Gen.oneOf(vals)
      id <- Gen.choose(0L, 20L)
    } yield (v, id))
  } yield rows

  property("rankViaBuckets == global row_number on random heavy-tie frames, both directions") =
    forAll(rankFrameGen, Gen.oneOf(true, false)) { (rows, asc) =>
      import org.apache.spark.sql.expressions.Window
      val df = rows.toDF("v", "id")
      val w =
        if (asc) Window.orderBy(col("v").asc, col("id").asc)
        else Window.orderBy(col("v").desc, col("id").asc)
      // duplicate (v, id) tuples get arbitrary tie order in BOTH forms —
      // compare the rank-ordered tuple sequences, invariant to it
      val want = df.withColumn("r", row_number().over(w).cast("long"))
        .orderBy("r").select("v", "id").as[(Double, Long)].collect().toSeq
      val got = graft.ops.Prep.rankViaBuckets(df, col("v"), col("id"),
          ascending = asc, buckets = 7, rankCol = "r")
        .orderBy("r").select("v", "id").as[(Double, Long)].collect().toSeq
      Prop(want == got) :| s"asc=$asc want=$want got=$got"
    }

  property("runningTotalsViaBuckets == unpartitioned running sums on random value-keyed frames") =
    forAll(rankFrameGen, Gen.oneOf(true, false)) { (rows, inclusive) =>
      import org.apache.spark.sql.expressions.Window
      // collapse to value grain with two integer weights (the q93 shape)
      val c = rows.toDF("v", "id")
        .groupBy("v")
        .agg(count(lit(1)).as("ca"), sum(col("id")).as("cb"))
      val end = if (inclusive) 0L else -1L
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
      val want = c
        .withColumn("wa", coalesce(sum(col("ca")).over(w), lit(0L)))
        .withColumn("wb", coalesce(sum(col("cb")).over(w), lit(0L)))
        .orderBy("v").select("v", "wa", "wb")
        .as[(Double, Long, Long)].collect().toSeq
      val got = graft.ops.Prep.runningTotalsViaBuckets(c, col("v"),
          Seq("ca" -> "wa", "cb" -> "wb"), inclusive = inclusive, buckets = 7)
        .orderBy("v").select("v", "wa", "wb")
        .as[(Double, Long, Long)].collect().toSeq
      Prop(want == got) :| s"inclusive=$inclusive want=$want got=$got"
    }
}
