package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries
import graft.ext.{Dedup, Similarity, TextOps}

/** Semantics of the round's new operators on crafted rows: calendar-spine
  * gap fill, forward fill, banded interval join (bin-boundary edges),
  * connected components, TF-IDF, corpus bigrams, group centroids.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)
  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("dailySpine covers the global [min,max] day range for every key") {
    val df = Seq((1L, d("2024-01-01")), (1L, d("2024-01-04")),
                 (2L, d("2024-01-02")))
      .toDF("k", "day")
    val spine = TimeSeries.dailySpine(df, col("k"), col("day"))
      .as[(Long, java.sql.Date)].collect().toSet
    // range is GLOBAL (01-01..01-04) for both keys, 4 days × 2 keys
    assert(spine.size == 8)
    assert(spine.contains((2L, d("2024-01-01"))))   // before key 2's first row
    assert(spine.contains((2L, d("2024-01-04"))))
  }

  test("forwardFill carries last non-null forward; leading nulls stay null") {
    val df = Seq((1L, 1, None: Option[Double]), (1L, 2, Some(5.0)),
                 (1L, 3, None), (1L, 4, Some(7.0)), (1L, 5, None),
                 (2L, 1, None))
      .toDF("k", "i", "v")
    val got = df.withColumn("f",
        TimeSeries.forwardFill(col("v"), Seq(col("k")), col("i")))
      .orderBy("k", "i").select("f").as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(5.0), Some(5.0), Some(7.0), Some(7.0), None))
  }

  test("countInWindow: inclusive edges, bin-boundary crossing, zero rows kept") {
    // bins are 300 s wide; probe at 650 s has lookback [350, 650] which
    // spans bins 1 and 2 — build rows at 350 (edge, bin 1), 600 (bin 2),
    // 651 (after -> out), 349 (just before -> out)
    val probe = Seq((10L, 1L, ts(650)), (11L, 1L, ts(100)), (12L, 2L, ts(650)))
      .toDF("id", "k", "t")
    val build = Seq((1L, ts(350)), (1L, ts(600)), (1L, ts(651)), (1L, ts(349)))
      .toDF("k", "t")
    val got = TimeSeries.countInWindow(probe, col("k"), col("t"), col("id"),
        build, col("k"), col("t"), windowSec = 300L)
      .orderBy("p_id").as[(Long, Long)].collect().toSeq
    // probe 10: 350 (inclusive lower edge) + 600; probe 11: none in
    // [-200,100]; probe 12: different key -> zero, but the row SURVIVES
    assert(got == Seq((10L, 2L), (11L, 0L), (12L, 0L)))
  }

  test("connectedComponents: chain merges transitively, singleton survives") {
    // path 1-2-3 (1~3 only via 2), pair 10-11, isolated 20 (self-loop)
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val got = Dedup.connectedComponents(edges, col("a"), col("b"))
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L), (20L, 20L)))
  }

  test("connectedComponents converges on a long path within maxIter") {
    // path 0-1-2-...-9: min-label propagation needs ~path-length rounds
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect()
    assert(got.length == 10 && got.forall(_._2 == 0L))
  }

  test("tfidfTopK: rare term outranks common term at equal tf") {
    // 'rare' appears in 1 of 3 docs, 'the' in all 3 -> idf(rare) > idf(the)
    val docs = Seq((1L, "the rare"), (2L, "the cat"), (3L, "the dog"))
      .toDF("id", "text")
    val top1 = TextOps.tfidfTopK(docs, col("id"), col("text"), k = 1)
      .filter(col("doc") === 1).select("term").as[String].head()
    // equal tf 1: idf(rare) = ln(4/2)+1 beats idf(the) = ln(4/4)+1
    assert(top1 == "rare")
  }

  test("topBigrams counts adjacent pairs across the corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    val got = TextOps.topBigrams(docs, col("text"), k = 2)
      .as[(String, Long)].collect().toSeq
    // "a b": 2 (doc1) + 1 (doc2) = 3; then "b a": 1, "b c": 1 -> tie by name
    assert(got == Seq(("a b", 3L), ("b a", 1L)))
  }

  test("groupCentroids: per-dim means, long form") {
    val df = Seq((0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
                 (1, Array(10.0f, 20.0f)))
      .toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, col("label"), col("embedding"))
      .orderBy("label", "dim")
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(got == Seq((0, 1, 2.0, 2L), (0, 2, 4.0, 2L),
      (1, 1, 10.0, 1L), (1, 2, 20.0, 1L)))
  }

  test("contamination flags only train docs sharing a 3-gram with eval") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),     // train: shares "quick brown fox"
      (2L, "totally different words here"),  // train: clean
      (9L, "a quick brown fox appears"))     // eval
      .toDF("id", "text")
    val got = Dedup.contamination(docs, col("id"), col("text"),
        col("id") === 9)
      .as[(Long, Long)].collect().toSeq
    // the single shared trigram is "quick brown fox"; clean doc 2 and the
    // eval doc itself must not appear
    assert(got == Seq((1L, 1L)))
  }

  test("funnel: steps out of order do not count") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    // user 1: view->click->purchase (full funnel)
    // user 2: click BEFORE first view -> click stage not reached
    // user 3: view only
    val e = Seq(
      (1L, t(0), "view"), (1L, t(10), "click"), (1L, t(20), "purchase"),
      (2L, t(5), "click"), (2L, t(10), "view"),
      (3L, t(0), "view"))
      .toDF("user_id", "ts", "event_type")
    // drive the PRODUCTION stage logic (shared with q40_funnel)
    val (v, c, p) = graft.queries.BehaviorQueries.funnelStages(e)
    assert(v.count() == 3 && c.count() == 1 && p.count() == 1)
    assert(p.select("user_id").as[Long].head() == 1L)
  }

  test("orc sink round-trips with predicate pushdown available") {
    val dir = new java.io.File("target/tmp/orc_rt")
    val path = dir.getAbsolutePath
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "v")
    graft.sources.Sinks.orcOverwrite(df, path)
    val back = spark.read.orc(path)
    assert(back.filter(col("id") >= 2).count() == 2)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
  }
  test("ewmaSmooth: hand-computed decay weights, gap renormalization, key isolation") {
    import spark.implicits._
    val daily = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 3L, 4.0),
      ("b", 1L, 100.0)).toDF("k", "ed", "x")
    val got = graft.ops.TimeSeries.ewmaSmooth(daily, "k", "ed", "x",
        decay = 0.5, lookback = 2)
      .orderBy("k", "ed").select("k", "ed", "ewma")
      .as[(String, Long, Double)].collect().toSeq
    // day 0: 1/1 = 1 ; day 1: (2 + 0.5*1)/1.5 ; day 3 (gap at 2, day 1
    // still in the 2-day lookback): (4 + 0.25*2)/1.25 = 3.6 — day 3's
    // bin differs from day 1's, so this also exercises the cross-bin
    // explode path. Key b never mixes in.
    assert(got.map(_._1) == Seq("a", "a", "a", "b"))
    val vs = got.map(_._3)
    assert(math.abs(vs(0) - 1.0) < 1e-9 && math.abs(vs(1) - 2.5 / 1.5) < 1e-9 &&
      math.abs(vs(2) - 3.6) < 1e-9 && math.abs(vs(3) - 100.0) < 1e-9, s"got $vs")
  }

  test("changepoint: recovers a crafted level shift, exact segment means, key isolation") {
    import spark.implicits._
    // key a: 10,10,10,10,10 then 50,50,50,50,50 — the best split is after
    // day 5 (k=5), means 10 and 50 exactly. key b: flat series, every
    // split scores 0 → tie-break picks the EARLIEST day (k=1).
    val daily = ((1 to 10).map(d => ("a", d, if (d <= 5) 10L else 50L)) ++
      (1 to 4).map(d => ("b", d, 7L))).toDF("k", "day", "cnt")
    val got = graft.ops.TimeSeries.changepoint(daily, "k", "day", "cnt")
      .orderBy("k")
      .select("k", "change_day", "score", "mean_before", "mean_after")
      .as[(String, Int, Double, Double, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq(("a", 5), ("b", 1)), s"got $got")
    val a = got.head
    assert(a._4 == 10.0 && a._5 == 50.0, s"means ${(a._4, a._5)}")
    // Δ(5) = (10·50 − 5·300)²/(5·5·10) = 1000000/250 = 4000 exactly
    assert(a._3 == 4000.0, s"score ${a._3}")
    assert(got(1)._3 == 0.0, "flat series scores zero")
  }
}
