package graft

import graft.operators.Similarity

/** cosineNearDupPairs (q34's operator): result parity against a plain
  * Scala brute-force reference — proves the double-kernel prefilter's
  * slack band never drops a pair the exact decimal confirm would keep —
  * and the bucket-width scaling rule. */
class SimilarityPairsSpec extends SparkSpec {
  import spark.implicits._

  private def vectors(seed: Int, n: Int, dims: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      i.toLong -> Seq.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  private def brute(vecs: Seq[(Long, Seq[Float])], bits: Int,
                    threshold: Double): Set[(Long, Long)] = {
    def bucket(v: Seq[Float]): Long =
      (0 until bits).map(i => if (v(i) >= 0) 1L << i else 0L).sum
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
    }
    (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && bucket(va) == bucket(vb) && cos(va, vb) >= threshold
    } yield (ia, ib)).toSet
  }

  test("prefiltered pairs equal the brute-force reference") {
    val vecs = vectors(seed = 7, n = 150, dims = 12)
    val got = Similarity
      .cosineNearDupPairs(vecs.toDF("vec_id", "embedding"), bits = 4,
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute(vecs, bits = 4, threshold = 0.3)
    assert(want.nonEmpty, "fixture should produce pairs")
    assert(got == want)
  }

  test("bucket bits scale with the corpus, floored at 8, capped at dims") {
    assert(Similarity.bucketBitsFor(100, dims = 64) == 8)
    assert(Similarity.bucketBitsFor(1L << 20, dims = 64) == 20)
    assert(Similarity.bucketBitsFor(1L << 40, dims = 16) == 16, "dims cap")
    // monotone: a bigger corpus never gets fewer buckets
    val ns = Seq(10L, 1000L, 1000000L, 1000000000L)
    val bs = ns.map(Similarity.bucketBitsFor(_, dims = 64))
    assert(bs == bs.sorted)
    // candidate-pair growth stays ~linear: n²/2^bits <= 2n
    ns.foreach { n =>
      val b = Similarity.bucketBitsFor(n, dims = 64)
      assert(n.toDouble * n / math.pow(2, b) <= 2.0 * n,
        s"quadratic pair growth at n=$n bits=$b")
    }
  }
}
