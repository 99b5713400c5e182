package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** CDC snapshot diff (q64's kernel). */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(prev: Seq[(Long, String, Option[Long])],
                       curr: Seq[(Long, String, Option[Long])]) =
    SnapshotDiff.diff(
      prev.toDF("k", "a", "b"), curr.toDF("k", "a", "b"),
      Seq("k"), Seq("a", "b"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("status")))
      .toMap

  test("added / removed / changed / unchanged classified per key") {
    val got = statuses(
      prev = Seq((1L, "x", Some(10L)), (2L, "y", Some(20L)), (3L, "z", Some(30L))),
      curr = Seq((2L, "y", Some(20L)), (3L, "z", Some(31L)), (4L, "w", Some(40L))))
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null-safe: NULL vs value is a change, NULL vs NULL is not") {
    val got = statuses(
      prev = Seq((1L, "x", None), (2L, null, Some(5L))),
      curr = Seq((1L, "x", Some(7L)), (2L, null, Some(5L))))
    assert(got == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("boundary shift cannot alias: ('ab','c') differs from ('a','bc')") {
    val h1 = Seq(("ab", "c")).toDF("a", "b")
      .select(SnapshotDiff.rowHash(Seq(col("a"), col("b"))).as("h"))
      .as[String].head()
    val h2 = Seq(("a", "bc")).toDF("a", "b")
      .select(SnapshotDiff.rowHash(Seq(col("a"), col("b"))).as("h"))
      .as[String].head()
    assert(h1 != h2)
  }
}
