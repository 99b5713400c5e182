package graft

import org.apache.spark.sql.functions._
import graft.operators.Fusion

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(pairs: (Long, Long)*) =
    pairs.toDF("doc_id", "rank")

  test("rrf of one list reproduces 10^6 div (K + rank) in rank order") {
    val got = Fusion.rrf(Seq(ranking(7L -> 1L, 3L -> 2L, 9L -> 3L)),
        rrfK = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (7L, 1L, 1000000L / 61), (3L, 1L, 1000000L / 62),
      (9L, 1L, 1000000L / 63)))
  }

  test("a doc in both lists outscores a slightly better single-list doc") {
    // doc 1: rank 3 in both lists; doc 2: rank 1 in one list only.
    // 2/63 > 1/61, so fusion must put doc 1 first.
    val fused = Fusion.rrf(Seq(
        ranking(2L -> 1L, 1L -> 3L), ranking(1L -> 3L)),
      rrfK = 60, topK = 10).collect()
    assert(fused.head.getLong(0) == 1L && fused.head.getLong(1) == 2L)
    assert(fused(1).getLong(0) == 2L && fused(1).getLong(1) == 1L)
  }

  test("missing-list contribution is zero, not null") {
    val fused = Fusion.rrf(Seq(ranking(1L -> 1L), ranking(2L -> 1L)),
        rrfK = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fused == Map(1L -> 1000000L / 61, 2L -> 1000000L / 61))
  }

  test("rankOf is 1-based, dense, ordered desc with doc_id tiebreak") {
    val top = Seq((5L, 90L), (2L, 100L), (9L, 90L)).toDF("doc_id", "score_fp")
    val got = Fusion.rankOf(top, "score_fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 5L -> 2L, 9L -> 3L))
  }

  test("fused hybrid contains every doc of both component top-20s' union top") {
    // end-to-end smoke on real tables: the fused top-20 must be a
    // subset of the union of the two component top-50s (RRF can only
    // surface docs that appear in some list)
    val docs = Tables.documents(spark, sf())
    val e = Tables.embeddings(spark, sf()).select(
      col("vec_id").as("id"),
      graft.operators.Similarity.asDouble(col("embedding")).as("v"))
    val lex = Fusion.rankOf(
      graft.operators.TrainPrep.bm25Rank(docs,
        Seq("query", "window", "scan"), 50), "score_fp")
    val sem = graft.operators.Similarity
      .cosineTopKFast(e, e.filter(col("id") === 0), 50)
      .select(col("vec_id").as("doc_id"), col("rnk").cast("long").as("rank"))
    val members = (lex.select("doc_id").collect() ++
      sem.select("doc_id").collect()).map(_.getLong(0)).toSet
    val fused = Fusion.rrf(Seq(lex, sem), 60, 20)
      .collect().map(_.getLong(0))
    assert(fused.length == 20 && fused.forall(members.contains))
  }

  test("snippets picks the densest window, anchored at a hit, leftmost tie") {
    import spark.implicits._
    // doc 1: 'q1' at 3; 'q1 q2' at 8,9 -> window starting at 8 holds 2
    // distinct terms; the window at 3 holds only 1 (9 > 3+4)
    val docs = Seq(
      (1L, "w w q1 w w w w q1 q2 w w w"),
      (2L, "q2 w w w w w w w w w w w")).toDF("doc_id", "text")
    val ranked = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val out = Fusion.snippets(docs, ranked, Seq("q1", "q2"), width = 5)
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(out == List(
      (1L, 1L, 8L, 2L, "q1 q2 w w w"),
      (2L, 2L, 1L, 1L, "q2 w w w w")))
  }

  test("snippets same-count tie breaks to the leftmost hit anchor") {
    import spark.implicits._
    val docs = Seq((1L, "q1 w w w w w q1 w")).toDF("doc_id", "text")
    val ranked = Seq((1L, 1L)).toDF("doc_id", "rank")
    val out = Fusion.snippets(docs, ranked, Seq("q1"), width = 3)
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(out == List((1L, 1L, 1L, 1L, "q1 w w")))
  }
}
