package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

class FieldedBm25Spec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("query", "window", "scan")

  test("titleBoost = 1 degenerates to exactly bm25Rank") {
    val docs = Tables.documents(spark, sf())
    val plain = TrainPrep.bm25Rank(docs, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fielded = TrainPrep.bm25FieldedRank(docs, titleLen = 16,
        titleBoost = 1, terms, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fielded.toSeq == plain.toSeq)
  }

  test("a title hit outranks the same hit in the body") {
    // two docs, identical except WHERE the query term sits; same
    // lengths, same tf — only the field weight can separate them
    val docs = Seq(
      (1L, "query pad pad pad pad pad pad pad"), // term in title (first 4)
      (2L, "pad pad pad pad query pad pad pad")  // term in body
    ).toDF("doc_id", "text")
    val got = TrainPrep.bm25FieldedRank(docs, titleLen = 4, titleBoost = 3,
        Seq("query"), topK = 2)
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L))
    // and the plain ranker cannot separate them (tie broken by id only)
    val plain = TrainPrep.bm25Rank(docs, Seq("query"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(plain(0)._2 == plain(1)._2)
  }

  test("fielded == plain BM25 on a corpus with titles physically repeated") {
    // the early-tf-merge semantics, stated as exact equivalence:
    // weighting the title B× is the same as REPEATING the title B
    // times in an unweighted document — wtf, wdl, TT, nd, df all
    // coincide, so the two kernels must emit identical integers.
    val boost = 3
    val titleLen = 4
    val docs = Tables.documents(spark, sf())
      .filter(col("doc_id") < 200)
    val toks = split(col("text"), " ")
    val title = slice(toks, 1, titleLen)
    val body = slice(toks, lit(titleLen + 1),
      greatest(size(toks) - titleLen, lit(0)))
    val repeated = docs.select(col("doc_id"),
      concat_ws(" ", flatten(array(
        (1 to boost).map(_ => title) :+ body: _*))).as("text"))
    val fielded = TrainPrep.bm25FieldedRank(docs, titleLen, boost, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val plain = TrainPrep.bm25Rank(repeated, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fielded.toSeq == plain.toSeq)
  }
}
