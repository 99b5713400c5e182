package graft

import org.apache.spark.sql.functions._

import graft.operators.WeightedSample

/** Deterministic weighted sampling (q68/q69 kernels): two-phase prefix
  * sum partitioning-invariance, systematic-PPS cardinality and
  * inclusion guarantees, Bernoulli proportionality.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(11)
    (1 to n).map(i => (i.toLong, (rnd.nextInt(500) + 1).toLong))
  }

  test("withCumWeight computes the global prefix sum for any bucket count") {
    val rows = corpus(3000)
    val want = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, w)) =>
      (id, acc + w)
    }.drop(1).toMap
    val df = rows.toDF("id", "w").repartition(13)
    for (buckets <- Seq(1, 7, 32)) {
      val got = WeightedSample.withCumWeight(df, "id", "w", buckets)
        .select(col("id"), col("cum"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("systematicPps returns exactly k rows, large weights always in") {
    val rows = corpus(2000)
    val total = rows.map(_._2).sum
    val k = 37
    val df = rows.toDF("id", "w").repartition(9)
    val picked = WeightedSample.systematicPps(df, "id", "w", k)
      .select(col("id")).as[Long].collect().toSet
    assert(picked.size == k)
    // every row with w >= W/k is guaranteed a stride hit
    val must = rows.filter { case (_, w) => w >= total.toDouble / k }.map(_._1)
    must.foreach(id => assert(picked.contains(id), s"heavy row $id missing"))
  }

  test("systematicPps is partitioning-invariant (same ids for any layout)") {
    val rows = corpus(1000)
    val pick: Int => Set[Long] = parts =>
      WeightedSample.systematicPps(
          rows.toDF("id", "w").repartition(parts), "id", "w", 23)
        .select(col("id")).as[Long].collect().toSet
    assert(pick(1) == pick(17))
  }

  test("poissonInclude: deterministic, and inclusion rate tracks w/wMax") {
    val n = 20000
    val rows = (1 to n).map(i => (i.toLong, if (i % 2 == 0) 100L else 400L))
    val df = rows.toDF("id", "w")
    val wMax = lit(400L)
    val sel = df.filter(
        WeightedSample.poissonInclude("s1", col("id"), col("w"), wMax))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // expected inclusion: w=100 -> 25%, w=400 -> 100% of 10k each
    assert(sel(400L) == n / 2, "w == wMax rows must all be included")
    assert(math.abs(sel(100L) - 0.25 * n / 2) < 0.02 * n,
      s"w/wMax=0.25 rate off: ${sel(100L)}")
    // deterministic: second run identical
    val again = df.filter(
        WeightedSample.poissonInclude("s1", col("id"), col("w"), wMax))
      .count()
    assert(again == sel.values.sum)
  }

  test("poissonInclude: different seeds give different samples") {
    val df = (1 to 5000).map(i => (i.toLong, 1L)).toDF("id", "w")
    def ids(seed: String) = df.filter(
        WeightedSample.poissonInclude(seed, col("id"), col("w"), lit(2L)))
      .select(col("id")).as[Long].collect().toSet
    val a = ids("a"); val b = ids("b")
    assert(a != b)
    // both near 50%
    Seq(a, b).foreach(s => assert(math.abs(s.size - 2500) < 250))
  }
}
