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

  test("sharded execution equals the single-pass span set exactly") {
    val docs = Seq(
      1L -> ("AA" + S + "BB" + S.take(22)),
      2L -> ("CC" + S + "DD"),
      3L -> ("EE" + S.reverse + "FF"),
      4L -> S.reverse,
      5L -> "no duplicated content in this document at all")
    val df = docs.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val single = rows(ExactSubstring.dupSpans(df, "doc_id", "text", 20))
    for (p <- Seq(1, 3, 7)) {
      assert(rows(ExactSubstring.dupSpansSharded(
        df, "doc_id", "text", 20, passes = p)) == single, s"passes=$p")
    }
    assert(single.nonEmpty)
  }

  private def cleaned(docs: Seq[(Long, String)],
                      sp: Seq[(Long, Int, Long)]): Seq[(Long, String, Long, Long)] =
    ExactSubstring.removeSpans(docs.toDF("doc_id", "text"),
        sp.toDF("doc_id", "span_start", "span_len"), "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("removeSpans splices a middle span out exactly") {
    val got = cleaned(Seq(1L -> "abcdeXYZfgh"), Seq((1L, 6, 3L)))
    assert(got == Seq((1L, "abcdefgh", 3L, 1L)))
  }

  test("removeSpans handles multiple spans, span-at-end, full cover") {
    val docs = Seq(
      1L -> "AA1234BB5678CC", // two interior spans
      2L -> "keepMEdropTAIL",  // span runs to the end: no tail piece
      3L -> "gonecompletely",  // span covers the whole doc
      4L -> "untouched doc")   // no spans: excluded from output
    val sp = Seq(
      (1L, 3, 4L), (1L, 9, 4L),
      (2L, 7, 8L),
      (3L, 1, 14L))
    assert(cleaned(docs, sp) == Seq(
      (1L, "AABBCC", 8L, 2L),
      (2L, "keepME", 8L, 1L),
      (3L, "", 14L, 1L)))
  }

  test("removeSpans ∘ dupSpans removes exactly the duplicated chars") {
    // S duplicated across docs 1/2: the span is excised from BOTH
    // (the remove-every-occurrence boilerplate mode q164 exercises)
    val docs = Seq(
      1L -> ("qwertyuiop" + S + "asdfghjklz"),
      2L -> ("zxcvbnmlkj" + S + "poiuytrewq"))
    val df = docs.toDF("doc_id", "text")
    val sp = ExactSubstring.dupSpans(df, "doc_id", "text", 20)
    val got = ExactSubstring.removeSpans(df, sp, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "qwertyuiopasdfghjklz"),
      (2L, "zxcvbnmlkjpoiuytrewq")))
  }
}
