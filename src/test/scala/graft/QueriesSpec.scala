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
}
