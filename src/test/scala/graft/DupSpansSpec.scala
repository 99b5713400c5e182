package graft

import graft.operators.DupSpans

/** Repeated-span coverage (q75's kernel). */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val n = 20

  private def cov(docs: Seq[(Long, String)]): Map[Long, Long] =
    DupSpans.coverage(docs.toDF("doc_id", "text"), "doc_id", "text", n, 2)
      .as[(Long, Long)].collect().toMap

  // unique filler that shares no 20-gram with any other tag's filler
  // (seeded-random, NOT a shifted cyclic pattern — e.g. (i*7+tag)%26
  // makes every filler a phase of the same infinite string and they
  // all share grams)
  private def filler(tag: Char, len: Int): String =
    new scala.util.Random(tag.toLong).alphanumeric.take(len).mkString

  test("a shared 30-char substring covers exactly 30 chars in each doc") {
    val shared = "THE-EXACT-SHARED-RUN-OF-30-CHR"
    assert(shared.length == 30)
    val docs = Seq(
      1L -> (filler('q', 40) + shared + filler('z', 40)),
      2L -> (filler('m', 25) + shared + filler('k', 55)))
    val got = cov(docs)
    assert(got == Map(1L -> 30L, 2L -> 30L))
  }

  test("two separated shared regions form two islands and sum") {
    val a = "FIRST-SHARED-REGION-ALPHA-XYZ!"  // 30
    val b = "SECOND-SHARED-REGION-BETA-999!" // 30
    val docs = Seq(
      1L -> (a + filler('u', 50) + b),
      2L -> (filler('p', 33) + a + filler('w', 44) + b + filler('j', 20)))
    val got = cov(docs)
    assert(got == Map(1L -> 60L, 2L -> 60L))
  }

  test("docs with no repeated gram are absent; coverage <= doc length") {
    val shared = "A-COMMON-TWENTYFIVE-CHARS" // 25
    val docs = Seq(
      1L -> (shared + filler('d', 30)),
      2L -> (filler('e', 30) + shared),
      3L -> filler('f', 80)) // unique
    val got = cov(docs)
    assert(!got.contains(3L))
    assert(got(1L) == 25L && got(2L) == 25L)
    docs.foreach { case (id, t) =>
      got.get(id).foreach(c => assert(c <= t.length))
    }
  }

  test("a fully duplicated doc is 100% covered") {
    val t = filler('g', 120)
    val got = cov(Seq(1L -> t, 2L -> t))
    assert(got == Map(1L -> 120L, 2L -> 120L))
  }

  test("texts shorter than n never contribute") {
    val got = cov(Seq(1L -> "tiny", 2L -> "tiny", 3L -> filler('h', 50)))
    assert(got.isEmpty)
  }
}
