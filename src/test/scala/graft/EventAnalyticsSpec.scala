package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventAnalytics, TextAnalysis}

/** Session paths, transitions, last-touch attribution, rate anomalies
  * (q140-q143 kernels) + the Gopher-rule flags and source-TVD census
  * (q138-q139 kernels) on crafted micro-fixtures.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_id", "event_type", "ms")

  test("sessionized splits on gap and restarts numbering per user") {
    val out = EventAnalytics.sessionized(ev(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 1000L),
      (1L, 3L, "view", 2000000L),          // > 30 min after event 2
      (2L, 4L, "view", 5L)), gapMs = 1800000L)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("sessionPaths caps the path at maxLen and orders by ms then id") {
    val rows = (1L to 10L).map(i => (1L, i, s"e$i", i * 10))
    val out = EventAnalytics.sessionPaths(ev(rows: _*),
      gapMs = 1800000L, maxLen = 3, topK = 5)
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(("e1>e2>e3", 1L)))
  }

  test("sessionPaths breaks same-ms ties by event_id") {
    val out = EventAnalytics.sessionPaths(ev(
      (1L, 2L, "b", 100L), (1L, 1L, "a", 100L)),
      gapMs = 1800000L, maxLen = 8, topK = 5)
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a>b", 1L)))
  }

  test("transitionCensus counts within-session adjacent pairs only") {
    val out = EventAnalytics.transitionCensus(ev(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 10L),
      (1L, 3L, "a", 4000000L),             // new session: no b->a edge
      (1L, 4L, "b", 4000010L),
      (2L, 5L, "a", 0L), (2L, 6L, "c", 10L)), gapMs = 1800000L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", 2L, 666666L),
      ("a", "c", 1L, 333333L)))
  }

  test("lastTouchAttribution credits the latest in-window touch") {
    val out = EventAnalytics.lastTouchAttribution(
      ev((1L, 1L, "view", 0L), (1L, 2L, "click", 100L),
        (1L, 3L, "purchase", 200L),          // click at 100 wins over view
        (2L, 4L, "view", 0L),
        (2L, 5L, "purchase", 700000000L),    // view is 8.1 days old -> none
        (3L, 6L, "purchase", 50L))           // no touch at all -> none
        .withColumn("value", lit(10.0)),
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowMs = 604800000L)
      .select("touch_type", "n_conversions")
      .as[(String, Long)].collect().toSet
    assert(out == Set(("click", 1L), ("none", 2L)))
  }

  test("lastTouchAttribution same-ms tie resolves to the higher code (click)") {
    val out = EventAnalytics.lastTouchAttribution(
      ev((1L, 1L, "view", 100L), (1L, 2L, "click", 100L),
        (1L, 3L, "purchase", 200L))
        .withColumn("value", lit(1.0)),
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowMs = 604800000L)
      .select("touch_type").as[String].collect().toSeq
    assert(out == Seq("click"))
  }

  test("rateAnomalies flags a 2x spike only after 12 covered buckets") {
    // 24 calm hours at n=2, then one hour at n=5 (5*24*2=240 > 48*3=144)
    val calm = (0L until 24L).flatMap(h =>
      Seq.tabulate(2)(i => ("click", h * 3600000L + i)))
    val spike = Seq.tabulate(5)(i => ("click", 24L * 3600000L + i))
    val out = EventAnalytics.rateAnomalies(
      (calm ++ spike).toDF("event_type", "ms"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("click", 24L, 5L, 48L, 24L)))
  }

  test("forecastBacktest: trailing-mean forecast and integer MAE census") {
    // 24 calm hours at n=2, then an hour at n=5: fc=48/24=2, err=3;
    // plus 12 perfectly-predicted hours at n=2 (fc=2, err=0)
    val calm = (0L until 36L).flatMap(h =>
      Seq.tabulate(2)(i => ("click", h * 3600000L + i)))
    val spike = Seq.tabulate(3)(i => ("click", 36L * 3600000L + i))
    val out = graft.operators.EventAnalytics.forecastBacktest(
      (calm ++ spike).toDF("event_type", "ms"))
      .as[(String, Long, Long, Long)].collect()
    // evaluated cells: hours 12..36 (25 cells); only hour 36 errs
    // (n=3 vs fc=2) -> sum=1, mae_x100 = 100/25 = 4
    assert(out.toSeq == Seq(("click", 25L, 1L, 4L)))
  }

  test("rateAnomalies cold start (<12 trailing buckets) never flags") {
    val rows = (0L until 6L).flatMap(h =>
      Seq.tabulate(if (h == 5) 50 else 1)(i => ("view", h * 3600000L + i)))
    assert(EventAnalytics.rateAnomalies(rows.toDF("event_type", "ms"))
      .count() == 0L)
  }

  test("gopherFlags splits each rule as designed") {
    val docs = Seq(
      // passes all four rules
      (1L, "the quick brown fox jumps over the lazy dog and then " +
        "walks away into town fields beyond the river bank today"),
      (2L, "tiny doc"),                                  // fails wordcount
      (3L, ("spam " * 30).trim)                          // fails stopwords+rep
    ).toDF("doc_id", "text")
    val flags = TextAnalysis.gopherFlags(col("text"), 10, 80)
    val out = docs.select(col("doc_id") +: flags.map {
      case (n, c) => c.as(n) }: _*)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L) == ((true, true, true, true)))
    assert(out(2L)._1 == false)
    assert(out(3L)._3 == false && out(3L)._4 == false)
  }

  test("sourceUnigramTvd: identical sources diverge 0, disjoint ~1") {
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"),    // a,b identical -> tvd vs mix > 0
      ("c", "z z z")                     // c disjoint from {x,y}
    ).toDF("source", "text")
    val out = CorpusStats.sourceUnigramTvd(docs)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // corpus: x:4 y:2 z:3 (T=9). a: x:2 y:1 (s=3)
    // tvd(a) = 1/2 (|2/3-4/9| + |1/3-2/9| + |0-3/9|) = 1/3 -> 3333
    assert(out("a") == ((3L, 3333L)))
    assert(out("b") == ((3L, 3333L)))
    // c: |0-4/9| + |0-2/9| + |1-3/9| = 4/3; /2 = 2/3 -> 6666
    assert(out("c") == ((3L, 6666L)))
  }
}
