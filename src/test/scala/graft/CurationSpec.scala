package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextAnalysis}

/** Cross-document curation operators (operators/Curation) + the
  * wordNgrams expression they build on. */
class CurationSpec extends SparkSpec {

  test("wordNgrams: count = tokens-n+1, short docs empty, grams windowed") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b", "").toDF("text")
      .select(TextAnalysis.wordNgrams(col("text"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d", "c d e"))
    assert(got(1) === Seq.empty)
    // "" splits to one empty token -> still shorter than n
    assert(got(2) === Seq.empty)
  }

  test("wordChunks: non-overlapping, trailing partial kept, short doc = one chunk") {
    import spark.implicits._
    val df = Seq("a b c d e f g", "a b", "x").toDF("text")
      .select(TextAnalysis.wordChunks(col("text"), 3).as("c"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "d e f", "g"))
    assert(got(1) === Seq("a b"))
    assert(got(2) === Seq("x"))
  }

  test("coverageScore: exact OOV counts, empty docs absent, broadcast probe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zzz qqq the"),
      (3L, "")).toDF("doc_id", "text")
    val vocab = Seq("the", "cat", "on", "mat").toDF("tok")
    val scored = Curation.coverageScore(docs, "doc_id", "text", vocab)
    val got = scored.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 1: 6 tokens, 'sat' is OOV; doc 2: 2 of 3 OOV; doc 3 absent
    assert(got == Map(1L -> ((6L, 1L, 1.0 / 6.0)), 2L -> ((3L, 2L, 2.0 / 3.0))))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("boilerplateDocs: flags only docs sharing an n-gram in >=minDocs docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma shared footer text"),
      (2L, "delta epsilon zeta shared footer text"),
      (3L, "eta theta iota shared footer text"),
      (4L, "unique words only nothing repeats here"),
      (5L, "tiny")).toDF("doc_id", "text")
    val flagged = Curation.boilerplateDocs(docs, "doc_id", "text",
      n = 3, minDocs = 3)
      .as[Long].collect().sorted
    // "shared footer text" appears in docs 1,2,3; doc 4 shares nothing;
    // doc 5 is below n tokens.
    assert(flagged === Array(1L, 2L, 3L))
  }

  test("boilerplateDocs: below-threshold repeats do not flag") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three five")).toDF("doc_id", "text")
    // "one two three" occurs in 2 docs < minDocs=3
    assert(Curation.boilerplateDocs(docs, "doc_id", "text", 3, 3).count() === 0)
  }

  test("contaminatedDocs: train doc sharing any test n-gram is caught") {
    import spark.implicits._
    val train = Seq(
      (10L, "the quick brown fox jumps high"),
      (11L, "completely disjoint training content here")).toDF("doc_id", "text")
    val test = Seq(
      (90L, "benchmark asks about quick brown fox jumps")).toDF("doc_id", "text")
    val hits = Curation.contaminatedDocs(train, test, "doc_id", "text", n = 4)
      .as[Long].collect()
    // train 10 shares "quick brown fox jumps"; train 11 shares nothing
    assert(hits === Array(10L))
  }

  test("packSequences: exclusive prefix sums chop per stream at the budget") {
    import spark.implicits._
    val docs = Seq(
      // stream A: toks 300, 300, 300 -> prefixes 0, 300, 600 -> seq 0,0,1
      ("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 300L),
      // stream B packs independently: 600 -> prefix 0 -> seq 0; next seq 1
      ("B", 1L, 600L), ("B", 2L, 10L)).toDF("src", "ord", "tok")
    val got = Curation.packSequences(docs, "src", "ord", "tok", budget = 512L)
      .select(col("src"), col("ord"), col("seq"))
      .as[(String, Long, Long)].collect().sorted
    assert(got === Array(("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 1L),
      ("B", 1L, 0L), ("B", 2L, 1L)))
  }

  test("chunkDedupRebuild: keep-first removal, ordered rebuild, full-dup empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),  // owns both chunks -> untouched, absent
      (2L, "a b c x y z"),  // loses chunk 0 to doc1 -> rebuilt "x y z"
      (3L, "a b c d e f"),  // exact dup of doc1 -> loses ALL -> ""
      (4L, "q r s")).toDF("doc_id", "text")
    val got = Curation.chunkDedupRebuild(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, "")))
  }

  test("q55/q56/q58 smoke on sf0.001: census totals are consistent") {
    val dir = sf()
    val q = Queries.all
    val b = q("q55_boilerplate_ngrams")(spark, dir).collect()
    assert(b.map(_.getLong(1)).sum === Tables.documents(spark, dir).count())
    assert(b.forall(r => r.getLong(2) <= r.getLong(1)))
    val c = q("q56_ngram_decontaminate")(spark, dir).collect()
    assert(c.forall(r => r.getLong(2) <= r.getLong(1)))
    val p = q("q58_seq_packing")(spark, dir).collect()
    assert(p.map(_.getLong(2)).sum === Tables.documents(spark, dir).count())
    assert(p.forall(_.getLong(1) >= 1L))
  }
}
