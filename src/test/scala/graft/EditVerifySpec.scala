package graft

import graft.operators.Dedup

/** Banded edit-distance verification over candidate pairs (q82's
  * kernel, Dedup.editVerifiedPairs). */
class EditVerifySpec extends SparkSpec {
  import spark.implicits._

  private def verify(pairs: Seq[(Long, Long)],
                     docs: Seq[(Long, String)]): Map[(Long, Long), (Int, Int)] =
    Dedup.editVerifiedPairs(
        pairs.toDF("doc_a", "doc_b"),
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("exact distances for pairs within the verdict, correct max_len") {
    val docs = Seq(
      1L -> ("a" * 100),
      2L -> ("a" * 78 + "b" * 22), // 22 substitutions
      3L -> ("a" * 95))            // 5 deletions
    val got = verify(Seq((1L, 2L), (1L, 3L)), docs)
    assert(got == Map((1L, 2L) -> ((22, 100)), (1L, 3L) -> ((5, 100))))
  }

  test("pairs beyond 25% of the longer text are rejected") {
    val docs = Seq(1L -> ("a" * 100), 2L -> ("c" * 100))
    assert(verify(Seq((1L, 2L)), docs).isEmpty) // dist 100 > 25
  }

  test("the length prefilter only drops pairs the verdict would reject") {
    // |la-lb| = 40 > 100/4: prefiltered, and indeed dist=40 fails 25%
    val docs = Seq(1L -> ("a" * 100), 2L -> ("a" * 60),
      3L -> ("a" * 80)) // |diff|=20, dist=20, 80 <= 100: must survive
    val got = verify(Seq((1L, 2L), (1L, 3L)), docs)
    assert(got == Map((1L, 3L) -> ((20, 100))))
  }

  test("candidates with ids missing from docs simply drop (inner joins)") {
    val got = verify(Seq((1L, 99L)), Seq(1L -> "aaaa"))
    assert(got.isEmpty)
  }
}
