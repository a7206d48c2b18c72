package graft

/** Smoke + invariant tests for every registered query at sf0.001.
  * (Hash-level correctness vs DuckDB is the driver's Verify gate; locally
  * reproduced by tools/check_oracle.py.)
  */
class QueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query's output column names are distinct and non-empty") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      assert(cols.nonEmpty && cols.distinct.length == cols.length,
        s"$name has duplicate/empty columns: ${cols.mkString(",")}")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q45 approx equi-depth histogram tracks q44's exact buckets") {
    // At sf0.001 the sketch accuracy (10000) exceeds N, so edges are the
    // true percentiles: bucket populations must match the exact ntile form
    // up to ties straddling an edge.
    val exact = SparkEntry.queries("q44_equidepth_hist")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q45_equidepth_approx")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == (1 to 10).toSet, s"buckets: ${approx.keySet}")
    val n = exact.values.sum
    assert(approx.values.sum == n, "approx form must not drop rows")
    (1 to 10).foreach { b =>
      assert(math.abs(approx(b) - exact(b)).toDouble / (n / 10) < 0.05,
        s"bucket $b: approx ${approx(b)} vs exact ${exact(b)}")
    }
  }

  test("q30 approx distinct within 10% of q11 exact counts") {
    val exact = SparkEntry.queries("q11_count_distinct")(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("q30_approx_distinct")(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (y, (s, p)) =>
      val (as, ap) = approx(y)
      assert(math.abs(as - s).toDouble / s < 0.1, s"suppliers y=$y: $as vs $s")
      assert(math.abs(ap - p).toDouble / p < 0.1, s"parts y=$y: $ap vs $p")
    }
  }

  test("t22 surprisal is bounded by the information-theoretic range") {
    // every p(word) ∈ [1/N, 1] ⇒ each −ln p ∈ [0, ln N]; the per-doc
    // AVERAGE must land in the same closed interval (0 only if a doc's
    // every token were the whole corpus — impossible with >1 doc)
    import org.apache.spark.sql.functions._
    val tok = graft.core.Tables.documents(spark, sf)
      .select(explode(graft.ext.TextOps.words(col("text"))))
    val lnN = math.log(tok.count().toDouble)
    val scores = SparkEntry.queries("t22_unigram_surprisal")(spark, sf)
      .select("avg_surprisal").collect().map(_.getDouble(0))
    assert(scores.forall(s => s > 0.0 && s <= lnN + 1e-9),
      s"surprisal outside (0, ln N=$lnN]")
  }

  test("t23 survivors: one per component, the longest member wins") {
    val surv = SparkEntry.queries("t23_cluster_survivors")(spark, sf).collect()
    // component ids are unique (one survivor each) and each survivor's
    // word_count is >= its component's size-weighted floor of 1
    val comps = surv.map(_.getLong(0))
    assert(comps.distinct.length == comps.length)
    // multi-member components exist at sf0.001 (the fixture plants dups)
    assert(surv.exists(_.getLong(3) > 1), "no multi-member cluster found")
  }

  test("t50 canonical URLs are actually canonical and account for every doc") {
    val rows = SparkEntry.queries("t50_url_canonicalize")(spark, sf).collect()
    val urls = rows.map(_.getString(0))
    // canonicalization invariants: lowercase, no www., no default port,
    // no fragment, no tracking params, no trailing slash, sorted params
    urls.foreach { u =>
      assert(u == u.toLowerCase && u.startsWith("https://"), u)
      assert(!u.contains("www.") && !u.contains(":443"), u)
      assert(!u.contains("#") && !u.contains("utm_"), u)
      assert(!u.stripSuffix("?").endsWith("/"), u)
      val params = u.dropWhile(_ != '?').drop(1).split("&").toSeq
      assert(params == params.sorted, u)
    }
    // grouping is a partition of the corpus: every doc in exactly one group
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    // and variants DO collapse somewhere (messy case/port/slash/utm forms)
    assert(rows.exists(_.getLong(2) > 1), "no raw-variant collapse found")
  }

  test("t51 contamination: flag matches the exact integer rule, fracs in [0,1]") {
    val rows = SparkEntry.queries("t51_eval_contamination")(spark, sf).collect()
    rows.foreach { r =>
      val (n, c, f, flag) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(c >= 0 && c <= n, r.toString)
      assert(math.abs(f - c.toDouble / n) < 1e-15, r.toString)
      assert(flag == (c * 5 >= n), r.toString)
    }
    // eval docs themselves are excluded from the report
    assert(rows.forall(_.getLong(0) % 97 != 0))
  }
}
