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
}
