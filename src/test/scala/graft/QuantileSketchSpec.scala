package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** t-digest quantile sketch (q67's kernel): exact-regime equality with
  * sorted ranks, partitioning invariance, approximate-regime rank error,
  * and the compressed-size bound.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def exactRank(sorted: IndexedSeq[Double], q: Double): Double =
    sorted((math.floor(q * (sorted.length - 1)).toLong + 1L).toInt - 1)

  test("exact regime (compression >= 2n): equals sorted ranks under any partitioning") {
    val rnd = new scala.util.Random(7)
    val vals = (1 to 1500).map(_ => rnd.nextDouble() * 1000.0)
    val sorted = vals.sorted.toIndexedSeq
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val want = qs.map(exactRank(sorted, _))
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(QuantileSketch.quantiles(col("v"), qs, compression = 4000).as("q"))
        .as[Seq[Double]].head()
      assert(got == want, s"parts=$parts")
    }
  }

  test("exact regime handles duplicate values") {
    val vals = Seq.fill(100)(1.0) ++ Seq.fill(100)(2.0) ++ Seq.fill(100)(3.0)
    val got = vals.toDF("v").repartition(5)
      .agg(QuantileSketch.quantiles(col("v"), Seq(0.1, 0.5, 0.95), 1000).as("q"))
      .as[Seq[Double]].head()
    assert(got == Seq(1.0, 2.0, 3.0))
  }

  test("approximate regime: rank error stays within 2% at compression=100") {
    val rnd = new scala.util.Random(42)
    val n = 20000
    val vals = (1 to n).map(_ => rnd.nextDouble())
    val sorted = vals.sorted.toIndexedSeq
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99)
    val got = vals.toDF("v").repartition(16)
      .agg(QuantileSketch.quantiles(col("v"), qs, compression = 100).as("q"))
      .as[Seq[Double]].head()
    qs.zip(got).foreach { case (q, est) =>
      // rank of the estimate in the true sorted data vs the target rank
      val rank = sorted.count(_ <= est)
      val target = q * n
      assert(math.abs(rank - target) <= 0.02 * n,
        s"q=$q est=$est rank=$rank target=$target")
    }
  }

  test("compress bounds the summary size and preserves total weight") {
    val rnd = new scala.util.Random(3)
    val singletons =
      Vector.fill(50000)((rnd.nextDouble() * 1e6, 1L))
    val c = QuantileSketch.compress(singletons, compression = 100)
    // k1 merge pass bound: adjacent output pairs span k > 1 over a
    // total k-range of c/2, so at most c + 1 centroids survive
    assert(c.length <= 101, s"got ${c.length} centroids")
    assert(c.iterator.map(_._2).sum == 50000L)
    // value-sorted output
    assert(c.map(_._1) == c.map(_._1).sorted)
  }

  test("exact-regime compression scales with the input count") {
    // the de-trap: q67/q76 derive compression from the actual row
    // count instead of an sf0.1-sized constant, so the exact regime
    // (compression >= 2n, no singleton merges) holds at ANY sf
    assert(QuantileSketch.exactCompressionFor(100) == 200)
    assert(QuantileSketch.exactCompressionFor(100000) == 200000)
    assert(QuantileSketch.exactCompressionFor(1000000) == 2000000)
    assert(QuantileSketch.exactCompressionFor(0) == 64, "small-n floor")
    // monotone in n — growing the input can never leave the regime
    val ns = Seq(10L, 1000L, 50000L, 5000000L)
    assert(ns.map(QuantileSketch.exactCompressionFor) ==
      ns.map(QuantileSketch.exactCompressionFor).sorted)
    // refuses (not silently degrades) where the regime is infeasible
    intercept[IllegalArgumentException] {
      QuantileSketch.exactCompressionFor(2000000000L)
    }
  }

  test("tail centroids stay much smaller than central ones") {
    val n = 10000
    val c = QuantileSketch.compress(
      (1 to n).map(i => (i.toDouble, 1L)).toVector, 100)
    // k1 is steep at the tails: the first centroid absorbs only until
    // (c/pi)*sqrt(q) > 1, i.e. ~(pi/c)^2*n ~ 10 points; the central
    // centroid spans dq ~ pi/c ~ 300 points
    assert(c.head._2 <= 16, s"head weight ${c.head._2}")
    assert(c.last._2 <= 16, s"last weight ${c.last._2}")
    assert(c.map(_._2).max >= 100L, "no big central centroid")
    assert(c.iterator.map(_._2).sum == n.toLong)
  }
}
