package graft

import graft.operators.SuffixArray

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Local reference: dense ranks of the maxLen-bounded suffixes under
    * a plain sort (ASCII fixtures, so JVM and UTF8-binary order agree). */
  private def bruteRanks(docs: Seq[(Long, String)],
                         maxLen: Int): Set[(Long, Int, Long)] = {
    val sfx = for {
      (d, t) <- docs
      p <- 1 to t.length
    } yield (d, p, t.substring(p - 1, math.min(t.length, p - 1 + maxLen)))
    val order = sfx.map(_._3).distinct.sorted.zipWithIndex.toMap
    sfx.map { case (d, p, s) => (d, p, order(s).toLong + 1) }.toSet
  }

  /** Local reference: longest substring (≤ maxLen) of each doc that
    * occurs ≥ 2 times in the corpus at distinct (doc, pos). */
  private def bruteLongest(docs: Seq[(Long, String)],
                           maxLen: Int): Map[Long, Long] = {
    val all = for {
      (d, t) <- docs
      l <- 1 to maxLen
      p <- 1 to t.length - l + 1
    } yield (t.substring(p - 1, p - 1 + l), d, p)
    val counts = all.groupBy(_._1).view.mapValues(_.size).toMap
    docs.map { case (d, t) =>
      val hits = for {
        l <- 1 to maxLen
        p <- 1 to t.length - l + 1
        if counts(t.substring(p - 1, p - 1 + l)) >= 2
      } yield l
      d -> (if (hits.isEmpty) 0L else hits.max.toLong)
    }.toMap
  }

  private def gotRanks(docs: Seq[(Long, String)],
                       maxLen: Int): Set[(Long, Int, Long)] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("ranks equal a local sort's dense ranks (short-suffix ties incl.)") {
    val docs = Seq(1L -> "banana", 2L -> "bandana", 3L -> "an", 4L -> "a",
      5L -> "")
    assert(gotRanks(docs, 8) == bruteRanks(docs, 8))
  }

  test("ranks match the reference on a random lowercase corpus") {
    val rnd = new scala.util.Random(41)
    val docs = (1L to 12L).map(d =>
      d -> Seq.fill(5 + rnd.nextInt(40))(
        ('a' + rnd.nextInt(4)).toChar).mkString)
    assert(gotRanks(docs, 16) == bruteRanks(docs, 16))
  }

  test("longest repeated substring per doc matches brute force") {
    val docs = Seq(
      1L -> "banana",            // "ana" repeats (overlapping positions)
      2L -> "bandana",           // shares "ban"/"ana" with 1
      3L -> "zqxvwk",            // nothing repeated
      4L -> "hello hello hello") // long within-doc repeat
    val idx = SuffixArray.build(docs.toDF("doc_id", "text"),
      "doc_id", "text", maxLen = 8)
    val got = SuffixArray.longestRepeatPerDoc(idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteLongest(docs, 8))
  }

  test("repeat lengths cap at maxLen when identical docs exceed it") {
    val docs = Seq(1L -> "abcdefghijkl", 2L -> "abcdefghijkl")
    val idx = SuffixArray.build(docs.toDF("doc_id", "text"),
      "doc_id", "text", maxLen = 8)
    val got = SuffixArray.longestRepeatPerDoc(idx)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 8L, 2L -> 8L))
    assert(got == bruteLongest(docs, 8))
  }

  test("startLen shortcut (q87's setting) yields identical ranks") {
    val rnd = new scala.util.Random(53)
    val docs = (1L to 10L).map(d =>
      d -> Seq.fill(3 + rnd.nextInt(50))(
        ('a' + rnd.nextInt(3)).toChar).mkString)
    val df = docs.toDF("doc_id", "text")
    def ranks(startLen: Int) =
      SuffixArray.suffixRanks(df, "doc_id", "text", 32, startLen = startLen)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = bruteRanks(docs, 32)
    assert(ranks(1) == want && ranks(8) == want && ranks(32) == want)
  }

  test("direct longest-repeat variant equals ladder and brute force") {
    val rnd = new scala.util.Random(67)
    val docs = (1L to 10L).map(d =>
      d -> Seq.fill(3 + rnd.nextInt(40))(
        ('a' + rnd.nextInt(3)).toChar).mkString) ++
      Seq(11L -> "zqxvwk", 12L -> "") // unique-only and empty docs
    val df = docs.toDF("doc_id", "text")
    def toMapOf(got: org.apache.spark.sql.DataFrame) =
      got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = toMapOf(
      SuffixArray.longestRepeatPerDocDirect(df, "doc_id", "text", 8))
    val ladder = toMapOf(SuffixArray.longestRepeatPerDoc(
      SuffixArray.build(df, "doc_id", "text", 8)))
    assert(direct == ladder)
    assert(direct == bruteLongest(docs.filter(_._2.nonEmpty), 8))
  }

  test("empty corpus builds an empty index instead of throwing") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(empty, "doc_id", "text", 8).count() == 0)
    val onlyEmptyDocs = Seq(1L -> "", 2L -> "").toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(onlyEmptyDocs, "doc_id", "text", 8)
      .count() == 0)
  }

  test("rank assignment is invariant to the bucket count") {
    val docs = Seq(1L -> "mississippi", 2L -> "missive", 3L -> "pips")
    val a = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", 8, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", 8, buckets = 13)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b && a == bruteRanks(docs, 8))
  }
}
