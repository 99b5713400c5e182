package graft

import graft.operators.GroupedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GroupedRank.withRank == the per-group window it replaces, on every
  * bucket/shape combination that exercises the offset arithmetic. */
class GroupedRankSpec extends SparkSpec {

  private def reference(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("rn", row_number().over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id")))
      .cast("long"))
    .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))

  private def frame(n: Int) = spark.range(n.toLong)
    .select(col("id"),
      concat(lit("g"), (col("id") % 7).cast("string")).as("g"),
      ((col("id") * 37) % 101).as("v"))

  test("matches the window reference across bucket counts") {
    val df = frame(1000)
    val want = reference(df).orderBy(col("g"), col("rn"))
      .collect().toSeq
    for (buckets <- Seq(1, 3, 8, 32)) {
      val got = GroupedRank.withRank(df, "g", Seq("v", "id"), buckets)
        .select(col("id"), col("g"), col("v"), col("rn"), col("cnt"))
        .orderBy(col("g"), col("rn")).collect().toSeq
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("single group, singleton groups, more buckets than rows") {
    val one = frame(50).withColumn("g", lit("only"))
    assert(GroupedRank.withRank(one, "g", Seq("v", "id"), 16)
      .select(col("id"), col("g"), col("v"), col("rn"), col("cnt"))
      .orderBy(col("rn")).collect().toSeq ==
      reference(one).orderBy(col("rn"))
        .select(col("id"), col("g"), col("v"), col("rn"), col("cnt"))
        .collect().toSeq)
    val tiny = frame(3) // 3 groups of 1, buckets >> rows
    val got = GroupedRank.withRank(tiny, "g", Seq("v", "id"), 32)
      .select(col("g"), col("rn"), col("cnt")).collect()
    assert(got.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L))
  }

  test("rank ties never straddle buckets (unique tiebreak required)") {
    // same v everywhere — the tiebreak id alone orders the group; the
    // two-phase ranks must still be the exact 1..n permutation
    val flat = spark.range(200).select(col("id"), lit("g").as("g"),
      lit(5L).as("v"))
    val got = GroupedRank.withRank(flat, "g", Seq("v", "id"), 8)
      .orderBy(col("id")).select(col("rn")).collect()
      .map(_.getLong(0)).toSeq
    assert(got == (1L to 200L))
  }

  private def cumReference(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("cum", sum(col("w")).over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    .withColumn("gtotal", sum(col("w")).over(Window.partitionBy(col("g"))))

  test("withCumSum matches the per-group running-sum window") {
    val df = frame(1000).withColumn("w", (col("id") % 13) + 1L)
    val want = cumReference(df)
      .select(col("id"), col("g"), col("cum"), col("gtotal"))
      .orderBy(col("id")).collect().toSeq
    for (buckets <- Seq(1, 3, 8, 32)) {
      val got = GroupedRank.withCumSum(df, "g", Seq("v", "id"), "w", buckets)
        .select(col("id"), col("g"), col("cum"), col("gtotal"))
        .orderBy(col("id")).collect().toSeq
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("withCumSum: zero weights and a single dominant group") {
    // zero-weight rows must keep their ordinal place without moving the
    // running sum; one group holding ~all rows is the straggler shape
    // the kernel exists for
    val df = spark.range(500).select(col("id"),
      when(col("id") < 490, lit("big")).otherwise(lit("tail")).as("g"),
      col("id").as("v"),
      when(col("id") % 5 === 0, 0L).otherwise(2L).as("w"))
    val want = cumReference(df)
      .select(col("id"), col("cum"), col("gtotal"))
      .orderBy(col("id")).collect().toSeq
    val got = GroupedRank.withCumSum(df, "g", Seq("v", "id"), "w", 8)
      .select(col("id"), col("cum"), col("gtotal"))
      .orderBy(col("id")).collect().toSeq
    assert(got == want)
  }
}
