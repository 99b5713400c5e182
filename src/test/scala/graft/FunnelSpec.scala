package graft

import graft.operators.Funnel

/** Strict sequential funnel (q74's kernel). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def times(rows: Seq[(Long, String, Long)]) =
    Funnel.stepTimes(rows.toDF("u", "et", "ms"), "u", "et", "ms", steps)
      .collect()
      .map(r => r.getLong(0) ->
        (0 until steps.length).map(i =>
          if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))))
      .toMap

  test("strict order: a click before the first view does not convert") {
    val t = times(Seq(
      (1L, "click", 5L), (1L, "view", 10L),            // click too early
      (2L, "view", 10L), (2L, "click", 20L), (2L, "buy", 30L)))
    assert(t(1L) == Seq(Some(10L), None, None))
    assert(t(2L) == Seq(Some(10L), Some(20L), Some(30L)))
  }

  test("earliest-after greedy picks the first feasible time per step") {
    // clicks at 5 (too early) and 15; buy at 12 predates t2=15 -> out
    val t = times(Seq(
      (1L, "view", 10L), (1L, "click", 5L), (1L, "click", 15L),
      (1L, "buy", 12L)))
    assert(t(1L) == Seq(Some(10L), Some(15L), None))
  }

  test("equal timestamps do not satisfy strictly-after") {
    val t = times(Seq((1L, "view", 10L), (1L, "click", 10L)))
    assert(t(1L) == Seq(Some(10L), None, None))
  }

  test("max gap bounds each step window") {
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 50L), (1L, "buy", 200L),
      (2L, "view", 0L), (2L, "click", 150L)).toDF("u", "et", "ms")
    val got = Funnel.counts(rows, "u", "et", "ms", steps, maxGapMs = Some(100L))
      .collect().head
    // user 1: click at 50 in window, buy at 200 > 50+100 out;
    // user 2: click at 150 > 0+100 out
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((2L, 1L, 0L)))
  }

  test("counts are monotone non-increasing on real data") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .selectExpr("user_id", "event_type", "unix_millis(ts) as ms")
    val r = Funnel.counts(ev, "user_id", "event_type", "ms",
      Seq("view", "click", "purchase"), Some(86400000L)).collect().head
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
  }
}
