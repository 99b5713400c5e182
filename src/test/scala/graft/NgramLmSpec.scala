package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Stupid-backoff bigram LM: hand-computed scores on a tiny corpus,
  * the backoff branch, the unseen-word floor, and the <2-token drop. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // model corpus: ug a:3 b:3 x:1 (total 7); bg (a,b):3 (b,a):1 (b,x):1
  private def model = Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text")

  test("self-scored corpus matches hand-computed stupid backoff") {
    val got = NgramLm.score(model, model)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: (a,b)=1e6*3/3=1000000, (b,a)=1e6*1/3=333333, (a,b)=1000000
    //   -> 2333333 div 3 = 777777
    // doc2: (a,b)=1000000, (b,x)=333333 -> 1333333 div 2 = 666666
    assert(got.toSeq == Seq((1L, 3L, 777777L), (2L, 2L, 666666L)))
  }

  test("unseen bigram backs off to 0.4 * unigram / total") {
    val got = NgramLm.score(Seq((9L, "b b")).toDF("doc_id", "text"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (b,b) unseen -> 400000 * c1(b)=3 div 7 = 171428
    assert(got.toSeq == Seq((9L, 1L, 171428L)))
  }

  test("unseen word scores the zero floor; short docs are dropped") {
    val got = NgramLm.score(
      Seq((9L, "x zzz"), (10L, "solo"), (11L, "")).toDF("doc_id", "text"),
      model)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((9L, 0L)), "zzz unseen -> 0; 1-token docs dropped")
  }

  test("out-of-distribution text scores below the corpus (the filter signal)") {
    val docs = Tables.documents(spark, sf())
    val corpus = NgramLm.score(docs, docs)
      .agg(avg(col("lm_score"))).head.getDouble(0)
    assert(corpus > 0, "in-distribution docs must have positive LM mass")
    // foreign-vocabulary doc: every transition falls to the unseen floor
    val gib = Seq((99999L, "zz1 zz2 zz3 zz4")).toDF("doc_id", "text")
    val g = NgramLm.score(gib, docs).head.getLong(2)
    assert(g == 0L && g < corpus,
      s"OOD doc ($g) should score below the corpus mean ($corpus)")
  }
}
