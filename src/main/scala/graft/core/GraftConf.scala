package graft.core

import org.apache.spark.sql.SparkSession

/** Runtime session settings the engine requires, applied idempotently at
  * every entry point (queries receive an arbitrary driver session).
  */
object GraftConf {
  def ensure(spark: SparkSession): Unit = {
    // Reference parity (SURVEY.md §2.3 P3): Spark 3.5 non-ANSI semantics —
    // unparsable cast → null, out-of-range getItem → null — which the
    // dropna-based validation depends on. Spark 4 defaults ANSI on.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // Timestamp determinism: events.ts arrives as naive TIMESTAMP(µs) in
    // current testdata generations and is cast NTZ→LTZ in Tables.events;
    // pin the session tz so that cast (and all date_trunc/window bucketing
    // over it) is host-independent and matches the DuckDB oracle's naive
    // wall-clock arithmetic.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Engine optimizer rules (inert until their conf keys opt in) — the
    // runtime twin of `spark.sql.extensions=graft.functions.GraftExtensions`.
    graft.plans.ApproxDistinctRewrite.install(spark)
    graft.plans.ApproxPercentileRewrite.install(spark)
  }
}
