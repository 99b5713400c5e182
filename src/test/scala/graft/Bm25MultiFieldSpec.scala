package graft

import graft.operators.TrainPrep

class Bm25MultiFieldSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (id, title-ish meta field, body field)
    (1L, "alpha news", "cats sit on mats and nap all day long here"),
    (2L, "beta blog", "alpha appears only in this very long body text " +
      "with many many extra filler tokens to stretch the length out"),
    (3L, "gamma wire", "dogs run fast"),
    (4L, "alpha wire", "dogs and cats share a mat")
  ).toDF("doc_id", "meta", "body")

  test("a metadata-only term is found, df counted across fields") {
    val got = TrainPrep.bm25MultiFieldRank(docs, "doc_id",
      Seq(("meta", 1L), ("body", 1L)), Seq("alpha"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // docs 1, 2, 4 contain 'alpha' somewhere; doc 3 does not
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got.values.forall(_ == 1L)) // n_terms = 1 everywhere
  }

  test("per-field normalization: short-field hit beats a diluted body hit") {
    // Same single occurrence of 'alpha': docs 1 and 4 carry it in the
    // 2-token meta field (field length == field average), doc 2 buries
    // it in a body much longer than the body average. True BM25F
    // normalizes within the field, so doc 2 must rank below 1 and 4 —
    // the exact property early tf-merging destroys (there the one
    // shared length pool dilutes nothing field-specifically).
    val ranked = TrainPrep.bm25MultiFieldRank(docs, "doc_id",
      Seq(("meta", 1L), ("body", 1L)), Seq("alpha"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val score = ranked.toMap
    assert(score(1L) == score(4L), "equal meta hits in equal-length fields")
    assert(score(2L) < score(1L), s"diluted body hit must score lower: $score")
  }

  test("field weight multiplies the field's normalized tf") {
    val w1 = TrainPrep.bm25MultiFieldRank(docs, "doc_id",
      Seq(("meta", 1L), ("body", 1L)), Seq("alpha"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val w4 = TrainPrep.bm25MultiFieldRank(docs, "doc_id",
      Seq(("meta", 4L), ("body", 1L)), Seq("alpha"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // boosting the meta field raises meta-hit docs, leaves the pure
    // body hit unchanged
    assert(w4(1L) > w1(1L) && w4(4L) > w1(4L))
    assert(w4(2L) == w1(2L))
  }

  test("score matches the hand-evaluated BM25F formula") {
    // doc 3, term 'dogs' in body only: nd=4, body df counts both
    // field occurrences' docs (3 and 4)
    val out = TrainPrep.bm25MultiFieldRank(docs, "doc_id",
      Seq(("meta", 2L), ("body", 1L)), Seq("dogs"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val nd = 4L
    val bodyLens = Map(1L -> 10L, 2L -> 20L, 3L -> 3L, 4L -> 6L)
    val tt1 = bodyLens.values.sum
    val df = 2L // docs 3 and 4
    def score(dl1: Long, tf1: Long): Long = {
      val wtf = (4L * tf1 * tt1).toDouble / (tt1 + 3L * dl1 * nd).toDouble
      val idf = (2L * (nd - df) + 1L).toDouble / (2L * df + 1L).toDouble
      math.floor(idf * ((5 * wtf) / (6 + 5 * wtf)) * 1e6).toLong
    }
    assert(out(3L) == score(bodyLens(3L), 1L))
    assert(out(4L) == score(bodyLens(4L), 1L))
  }
}
