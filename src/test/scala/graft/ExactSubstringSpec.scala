package graft

import graft.operators.ExactSubstring

class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minLen: Int,
                    fast: Boolean = true): Seq[(Long, Int, Long)] =
    ExactSubstring.dupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, fast)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  // 30 distinct-ish chars; its 20-grams are unique WITHIN one occurrence
  private val S = "0123456789ABCDEFGHIJKLMNOPQRST"

  test("a substring shared by two docs emits exactly its span in both") {
    val docs = Seq(
      1L -> ("qwertyuiop" + S + "asdfghjklz"),
      2L -> ("zxcvbnmlkj" + S + "poiuytrewq"))
    // S occupies positions 11..40 in both docs; duplicated 20-gram
    // starts are 11..21 and must merge into ONE maximal 30-char span
    assert(spans(docs, 20) ==
      Seq((1L, 11, 30L), (2L, 11, 30L)))
  }

  test("within-doc repetition counts as duplication") {
    val s25 = S.take(25)
    val docs = Seq(1L -> (s25 + "-!unique interlude!-" + s25))
    assert(spans(docs, 20) == Seq((1L, 1, 25L), (1L, 46, 25L)))
  }

  test("corpus with no duplicated substring emits nothing") {
    val docs = Seq(
      1L -> "every gram here appears once only",
      2L -> "and nothing overlaps with doc one")
    assert(spans(docs, 20).isEmpty)
  }

  test("docs shorter than minLen never emit") {
    val docs = Seq(1L -> "short", 2L -> "short")
    assert(spans(docs, 20).isEmpty)
  }

  test("aggregate fallback path agrees with the window fast path") {
    val docs = Seq(
      1L -> ("AA" + S + "BB" + S.take(22)),
      2L -> ("CC" + S + "DD"),
      3L -> "no duplicated content in this one at all")
    val a = spans(docs, 20, fast = true)
    val b = spans(docs, 20, fast = false)
    assert(a == b && a.nonEmpty)
  }

  test("adjacent duplicated windows merge; separated ones do not") {
    // two duplicated regions in doc 1 separated by >minLen unique text
    val t1 = S.take(24)
    val t2 = S.reverse.take(24)
    val docs = Seq(
      1L -> (t1 + "#### unique separator ####" + t2),
      2L -> t1, 3L -> t2)
    val got = spans(docs, 20)
    assert(got.filter(_._1 == 1L) == Seq((1L, 1, 24L), (1L, 51, 24L)))
  }
}
