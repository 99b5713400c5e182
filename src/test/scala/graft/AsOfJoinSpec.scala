package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest right at-or-before left, per key") {
    val quotes = Seq( // key, time, price-id
      ("A", 10L, 100L), ("A", 20L, 101L), ("A", 30L, 102L),
      ("B", 15L, 200L))
      .toDF("sym", "qt", "qid")
    val trades = Seq(
      ("A", 5L, 1L),   // before any quote -> null
      ("A", 10L, 2L),  // equal time -> inclusive match 100
      ("A", 25L, 3L),  // between -> 101
      ("A", 99L, 4L),  // after all -> 102
      ("B", 14L, 5L),  // before B's quote -> null
      ("C", 50L, 6L))  // key with no quotes -> null
      .toDF("sym", "tt", "tid")
    val out = AsOfJoin.join(trades, quotes, "sym", "tt", "qt", Seq("qid"))
      .select(col("tid"), col("qid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> -1L, 2L -> 100L, 3L -> 101L, 4L -> 102L,
      5L -> -1L, 6L -> -1L))
  }

  test("all left rows survive (left-outer cardinality)") {
    val right = Seq(("k", 1L, 9L)).toDF("k", "rt", "v")
    val left = (1 to 500).map(i => ("k", i.toLong, i.toLong))
      .toDF("k", "lt", "id")
    assert(AsOfJoin.join(left, right, "k", "lt", "rt", Seq("v")).count() == 500)
  }
}
