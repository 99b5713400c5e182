package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-min sketch: the one-sided guarantee (never underestimates),
  * the merge = rebuild identity, absent-item behavior, and the
  * partial-agg shuffle bound (sketch-sized, not corpus-sized). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val d = 3
  private val lw = 4 // w = 16: tiny on purpose, forces collisions

  private def corpus = {
    val rnd = new scala.util.Random(5)
    (1 to 2000).map(_ => s"w${rnd.nextInt(60)}").toDF("item")
  }

  test("estimates never underestimate; exact when no collision") {
    val c = corpus.cache()
    val truth = c.groupBy(col("item")).agg(count(lit(1)).as("tf"))
    val sk = CountMin.build(c, col("item"), d, lw)
    val got = CountMin.estimate(sk, truth, col("item"), d, lw)
      .join(truth, Seq("item"))
    assert(got.filter(col("est") < col("tf")).count() == 0,
      "CMS must never underestimate")
    assert(got.filter(col("est") > col("tf")).count() > 0,
      "w=16 over 60 keys must collide somewhere")
    c.unpersist()
  }

  test("merging two half-sketches equals building over the union") {
    val a = corpus.filter(expr("substring(item, 2) % 2 = 0"))
    val b = corpus.filter(expr("substring(item, 2) % 2 = 1"))
    val merged = CountMin.merge(
      CountMin.build(a, col("item"), d, lw),
      CountMin.build(b, col("item"), d, lw))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = CountMin.build(corpus, col("item"), d, lw)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
  }

  test("an item whose cells were never touched estimates zero") {
    val tiny = Seq("a").toDF("item")
    val sk = CountMin.build(tiny, col("item"), d, log2w = 20)
    val got = CountMin.estimate(sk, Seq("zzz-absent").toDF("item"),
        col("item"), d, log2w = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("zzz-absent", 0L)))
  }

  test("shuffle is sketch-sized: partial aggregation before the exchange") {
    val plan = CountMin.build(corpus, col("item"), d, lw)
      .queryExecution.executedPlan.toString
    // partial HashAggregate below the exchange, final above it
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Exchange hashpartitioning(j"), plan)
  }
}
