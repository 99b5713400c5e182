package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // Brute-force single-node BPE reference: same greedy-left merge, same
  // (cnt DESC, l ASC, r ASC) tiebreak.
  private def bruteMerge(s: List[String], l: String, r: String): List[String] = {
    val buf = mutable.ListBuffer.empty[String]
    s.foreach { x =>
      if (buf.nonEmpty && buf.last == l && x == r)
        buf(buf.length - 1) = l + r
      else buf += x
    }
    buf.toList
  }

  private def bruteBpe(words: Seq[(String, Long)],
                       rounds: Int): Seq[(Int, String, String, Long)] = {
    var seqs = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((round, l, r, cnt))
        seqs = seqs.map { case (s, f) => (bruteMerge(s, l, r), f) }
        round += 1
      }
    }
    out.result()
  }

  private val corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learned merges match the brute-force reference") {
    val words = corpus.toDF("word", "freq")
    val got = BpeTrain.merges(words, rounds = 6)
    assert(got == bruteBpe(corpus, 6))
    // sanity on the classic example: 'es'/'est'-family merges dominate
    assert(got.head._4 == 9L) // (e,s) or (s,t) at freq 6+3
  }

  test("merges are partitioning-invariant") {
    val words = corpus.toDF("word", "freq")
    assert(BpeTrain.merges(words.repartition(7), 4) ==
      BpeTrain.merges(words.repartition(1), 4))
  }

  test("mergeOnce is greedy left-to-right and symbol-boundary safe") {
    val df = Seq("a a a a", "x aa a", "b ab a b").toDF("seq")
    val got = df.select(
        BpeTrain.mergeOnce(col("seq"), "a", "a").as("m"))
      .as[String].collect().toSeq
    // 'a a a a' -> non-overlapping greedy 'aa aa';
    // 'x aa a' must NOT merge inside the symbol 'aa';
    // 'b ab a b': the 'a' of 'ab' is not a standalone symbol
    assert(got == Seq("aa aa", "x aa a", "b ab a b"))
  }

  test("applyMerges and subwordCount shrink with learned merges") {
    val words = corpus.toDF("word", "freq")
    val ms = BpeTrain.merges(words, rounds = 8)
    val toks = Seq("newest").toDF("w")
      .select(BpeTrain.applyMerges(col("w"), ms).as("t"))
      .as[Seq[String]].collect().head
    // 8 merges on this 4-word corpus collapse 'newest' to 1-2 symbols
    assert(toks.length <= 2 && toks.mkString == "newest")
    val cnt = Seq("newest widest low").toDF("text")
      .select(BpeTrain.subwordCount(col("text"), ms).as("c"))
      .as[Int].collect().head
    val none = Seq("newest widest low").toDF("text")
      .select(BpeTrain.subwordCount(col("text"), Nil).as("c"))
      .as[Int].collect().head
    assert(none == "newestwidestlow".length)
    assert(cnt < none)
  }

  test("early exhaustion: single-char words learn no merges") {
    val words = Seq(("a", 3L), ("b", 2L)).toDF("word", "freq")
    assert(BpeTrain.merges(words, 5).isEmpty)
  }
}
