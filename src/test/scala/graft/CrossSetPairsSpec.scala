package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** crossSetNearPairs (q100's operator): parity against a plain Scala
  * brute force restricted to the multi-probe candidate set, asymmetry
  * (corpus-internal pairs never reported), and the planted-duplicate
  * recall guarantee (identical vectors share a bucket). */
class CrossSetPairsSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 4

  private def vectors(seed: Int, n: Int, dims: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      i.toLong -> Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
  }

  private def bucket(v: Seq[Double]): Long =
    (0 until bits).map(i => if (v(i) >= 0) 1L << i else 0L).sum

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
  }

  test("pairs equal brute force over the Hamming-1 probe set") {
    val all = vectors(seed = 11, n = 160, dims = 10)
    val (bench, corpus) = all.partition(_._1 % 10 == 0)
    val got = Similarity.crossSetNearPairs(
        corpus.toDF("id", "v"), bench.toDF("id", "v"),
        bits = bits, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (qi, qv) <- bench; (ci, cv) <- corpus
      probes = (0L +: (0 until bits).map(1L << _).map(_.toLong))
        .map(bucket(qv) ^ _).toSet
      if probes.contains(bucket(cv)) && cos(cv, qv) >= 0.25
    } yield (ci, qi)).toSet
    assert(want.nonEmpty, "fixture should flag some contamination")
    assert(got == want)
  }

  test("asymmetric: corpus-internal near-dups are not reported") {
    // two identical corpus vectors, bench far away in a different bucket
    val corpus = Seq(1L -> Seq(1.0, 1.0, 1.0, 1.0),
      2L -> Seq(1.0, 1.0, 1.0, 1.0)).toDF("id", "v")
    val bench = Seq(100L -> Seq(-1.0, -1.0, -1.0, -1.0)).toDF("id", "v")
    val got = Similarity.crossSetNearPairs(corpus, bench, bits, 0.5)
    assert(got.count() == 0)
  }

  test("annRecall counts candidate coverage of the exact top-k") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("q_id", "vec_id")
    // duplicate candidate must count once; q2 has no candidates at all
    val cand = Seq((1L, 10L), (1L, 99L), (1L, 10L)).toDF("q_id", "vec_id")
    val got = Similarity.annRecall(exact, cand, k = 2)
      .orderBy(col("q_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 500L), (2L, 0L, 0L)))
  }

  test("cosineTopKFast is bit-identical to the decimal-only top-k") {
    val vecs = vectors(seed = 23, n = 120, dims = 16)
      .map { case (i, v) => (i, v) }
    val df = vecs.toDF("id", "v")
    val queries = df.filter(col("id") < 12)
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col("q_id"), col("vec_id"), col("cosim"), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val slow = rows(Similarity.cosineTopK(df, queries, 7))
    val fast = rows(Similarity.cosineTopKFast(df, queries, 7))
    assert(slow.nonEmpty && fast == slow)
  }

  test("a planted benchmark duplicate is always recalled") {
    val noise = vectors(seed = 3, n = 50, dims = 6).map {
      case (i, v) => (i + 1000L, v)
    }
    val planted = Seq(0.9, -0.8, 0.7, -0.6, 0.5, -0.4)
    val corpus = (noise :+ (1L -> planted)).toDF("id", "v")
    val bench = Seq(500L -> planted).toDF("id", "v")
    val got = Similarity.crossSetNearPairs(corpus, bench, bits, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 500L)))
  }
}
