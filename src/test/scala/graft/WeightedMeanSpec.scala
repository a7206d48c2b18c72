package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, WeightedMean}

class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  private def wmean(df: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    df.groupBy("g")
      .agg(call_function("graft_wmean",
        col("x").cast("decimal(18,6)"), col("w").cast("decimal(18,6)")).as("m"))
  }

  test("graft_wmean == Σxw/Σw exactly; null inputs skipped") {
    val df = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0),
      ("b", 5.0, 2.0), ("b", 7.0, 0.0)
    ).toDF("g", "x", "w")
    val got = wmean(df).orderBy("g").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 70.0 / 4.0), ("b", 10.0 / 2.0)))
    val withNull = df.union(Seq(("a", Double.NaN, Double.NaN)).toDF("g", "x", "w")
      .select(col("g"), lit(null).cast("double").as("x"), lit(null).cast("double").as("w")))
    assert(wmean(withNull).orderBy("g").as[(String, Double)].collect().toSeq == got)
  }

  test("merge-order independence: any repartitioning yields the identical double") {
    // values chosen so a DOUBLE accumulator would be order-sensitive
    // (large + many smalls); the decimal buffer must not be
    val rows = (1 to 2000).map(i => ("k", if (i == 1) 1e10 else 0.1, 1.0))
    val df = rows.toDF("g", "x", "w")
    val a = wmean(df.repartition(1)).as[(String, Double)].head()._2
    val b = wmean(df.repartition(32)).as[(String, Double)].head()._2
    val c = wmean(df.repartition(7, col("x"))).as[(String, Double)].head()._2
    assert(a == b && b == c, s"merge order leaked into the result: $a / $b / $c")
    // the exact rational: (1e10 + 1999·0.1) / 2000 with the inputs
    // rounded to scale 6 first
    val exact = (BigDecimal("10000000000.000000") +
      BigDecimal("0.100000") * 1999).toDouble / 2000.0
    assert(a == exact)
  }

  test("Aggregator object laws on the raw buffers: zero identity, associativity") {
    import java.math.{BigDecimal => JBD}
    def d(s: String) = new JBD(s)
    val in1 = (d("2.5"), d("2"))
    val in2 = (d("3.0"), d("4"))
    val b1 = WeightedMean.reduce(WeightedMean.zero, in1)
    val b2 = WeightedMean.reduce(WeightedMean.zero, in2)
    assert(WeightedMean.merge(WeightedMean.zero, b1) == b1)
    assert(WeightedMean.merge(b1, WeightedMean.zero) == b1)
    val seq = WeightedMean.reduce(b1, in2)
    val par = WeightedMean.merge(b1, b2)
    assert(seq._1.compareTo(par._1) == 0 && seq._2.compareTo(par._2) == 0)
    assert(WeightedMean.finish(par) == 17.0 / 6.0)
    assert(WeightedMean.finish(WeightedMean.zero).isNaN)
  }
}
