package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.{eq => req, Rule}

/** Blocked weighted-agreement linkage (q80's kernel). */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(req("name", 4), req("city", 2))

  private def score(l: Seq[(Long, Int, String, String)],
                    r: Seq[(Long, Int, String, String)]) = {
    val lf = l.toDF("id", "blk", "name", "city")
    val rf = r.toDF("id", "blk", "name", "city")
    RecordLinkage.scorePairs(lf, rf, "id", "id",
        col("blk"), col("blk"), rules,
        Map("name" -> (col("name"), col("name")),
          "city" -> (col("city"), col("city"))))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("scores sum the weights of agreeing fields") {
    val got = score(
      Seq((1L, 7, "ann", "rome"), (2L, 7, "bob", "oslo")),
      Seq((10L, 7, "ann", "rome"), (11L, 7, "ann", "oslo")))
    assert(got == Set(
      (1L, 10L, 6L), // name+city
      (1L, 11L, 4L), // name only
      (2L, 10L, 0L),
      (2L, 11L, 2L))) // city only
  }

  test("different blocks are never compared") {
    val got = score(
      Seq((1L, 1, "ann", "rome")),
      Seq((10L, 2, "ann", "rome")))
    assert(got.isEmpty)
  }

  test("nulls never agree") {
    val lf = Seq((1L, 3)).toDF("id", "blk")
      .withColumn("name", lit(null).cast("string"))
      .withColumn("city", lit("x"))
    val rf = Seq((9L, 3)).toDF("id", "blk")
      .withColumn("name", lit(null).cast("string"))
      .withColumn("city", lit("x"))
    val got = RecordLinkage.scorePairs(lf, rf, "id", "id",
        col("blk"), col("blk"), rules,
        Map("name" -> (col("name"), col("name")),
          "city" -> (col("city"), col("city"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 9L, 2L)))
  }

  test("custom comparator rules participate (within-tolerance agreement)") {
    val near = Rule("bal", (l, r) => abs(l - r) <= 1, 5)
    val lf = Seq((1L, 0, 100L), (2L, 0, 50L)).toDF("id", "blk", "bal")
    val rf = Seq((9L, 0, 101L)).toDF("id", "blk", "bal")
    val got = RecordLinkage.scorePairs(lf, rf, "id", "id",
        col("blk"), col("blk"), Seq(near),
        Map("bal" -> (col("bal"), col("bal"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 9L, 5L), (2L, 9L, 0L)))
  }
}
