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

  private def versionSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "attr", "vfrom", "vto")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("applyChanges equals the one-shot build for any split, ties included") {
    val rnd = new scala.util.Random(61)
    val all = (1L to 60L).map(i =>
      // equal-ts collisions on purpose (ts mod 7): the stored tiebreak
      // must keep the incremental rebuild exact
      (rnd.nextInt(6).toLong, (rnd.nextInt(7) * 100).toLong, i,
        s"v$i")).toDF("k", "ts", "id", "attr")
    val want = versionSet(
      Scd2.versions(all, "k", "ts", "id", Seq("attr"), keepTie = true))
    for (mod <- Seq(2L, 3L)) {
      val base = Scd2.versions(all.filter(col("id") % mod === 0),
        "k", "ts", "id", Seq("attr"), keepTie = true)
      val got = versionSet(Scd2.applyChanges(base,
        all.filter(col("id") % mod =!= 0), "k", "ts", "id", Seq("attr")))
      assert(got == want, s"split mod=$mod diverged")
    }
  }

  test("ts compares at stored long precision; sub-unit order defers to the tie") {
    // the window must order by the SAME cast-long value stored as
    // vfrom — otherwise applyChanges' rebuild-from-vfrom diverges
    // from the one-shot build for fractional timestamps
    val u = Seq((1L, 1.1, 7L, "A"), (1L, 1.9, 5L, "B"))
      .toDF("k", "ts", "id", "attr")
    val want = versionSet(
      Scd2.versions(u, "k", "ts", "id", Seq("attr"), keepTie = true))
    assert(want == Set((1L, "B", 1L, Some(1L)), (1L, "A", 1L, None)))
    val base = Scd2.versions(u.filter(col("id") === 5L),
      "k", "ts", "id", Seq("attr"), keepTie = true)
    assert(versionSet(Scd2.applyChanges(base, u.filter(col("id") === 7L),
      "k", "ts", "id", Seq("attr"))) == want)
  }

  test("applyChanges leaves unchanged keys' rows untouched") {
    val base = Scd2.versions(updates, "k", "ts", "id", Seq("attr"),
      keepTie = true)
    val changes = Seq((2L, 500L, 9L, "y")).toDF("k", "ts", "id", "attr")
    val got = Scd2.applyChanges(base, changes, "k", "ts", "id", Seq("attr"))
    // key 1 versions identical; key 2 now has two chained versions
    assert(versionSet(got.filter(col("k") === 1L)) ==
      versionSet(base.filter(col("k") === 1L)))
    assert(versionSet(got.filter(col("k") === 2L)) == Set(
      (2L, "x", 150L, Some(500L)), (2L, "y", 500L, None)))
  }
}
