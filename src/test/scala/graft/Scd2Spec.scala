package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 interval build + point-in-time lookup (q85's kernel). */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // updates: (key, ts, tie, attr)
  private val updates = Seq(
    (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "c"),
    (2L, 150L, 4L, "x"))
    .toDF("k", "ts", "id", "attr")

  test("versions chain [from, to) with an open current interval") {
    val v = Scd2.versions(updates, "k", "ts", "id", Seq("attr"))
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(v == Set(
      (1L, "a", 100L, Some(200L)),
      (1L, "b", 200L, Some(300L)),
      (1L, "c", 300L, None),
      (2L, "x", 150L, None)))
  }

  test("facts resolve to the version valid at their timestamp") {
    val facts = Seq((1L, 50L), (1L, 100L), (1L, 250L), (1L, 999L),
      (2L, 140L), (2L, 160L)).toDF("k", "fts")
    val v = Scd2.versions(updates, "k", "ts", "id", Seq("attr"))
    val got = Scd2.lookup(facts, v, "k", col("fts"))
      .select(col("k"), col("fts"), col("attr"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 100L, "a"),  // boundary: from is inclusive
      (1L, 250L, "b"),
      (1L, 999L, "c"),  // open interval
      (2L, 160L, "x"))) // 50 and 140 precede the first version: drop
  }

  test("same-timestamp updates produce a zero-width, unmatchable version") {
    val dup = Seq((3L, 100L, 1L, "old"), (3L, 100L, 2L, "new"))
      .toDF("k", "ts", "id", "attr")
    val v = Scd2.versions(dup, "k", "ts", "id", Seq("attr"))
    val got = Scd2.lookup(Seq((3L, 100L)).toDF("k", "fts"), v, "k", col("fts"))
      .select(col("attr")).as[String].collect().toSeq
    assert(got == Seq("new")) // [100,100) can't match; the survivor wins
  }
}
