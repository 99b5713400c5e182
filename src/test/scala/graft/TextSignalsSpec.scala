package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Deflate-ratio quality signal: ordering between templated / prose /
  * incompressible inputs, determinism, and null/empty contract. */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(rows: Seq[(Long, String)]): Map[Long, Double] =
    rows.toDF("id", "text")
      .select(col("id"), TextAnalysis.deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("templated text compresses below prose, noise above it") {
    val repeated = "spam ham " * 200
    val prose = Tables.documents(spark, sf()).select(col("text"))
      .head.getString(0)
    val noise = {
      val rnd = new scala.util.Random(42)
      (1 to 1600).map(_ => (rnd.nextInt(0x4000) + 0x100).toChar).mkString
    }
    val r = ratios(Seq(1L -> repeated, 2L -> prose, 3L -> noise))
    assert(r(1L) < 0.05, s"templated should collapse, got ${r(1L)}")
    assert(r(1L) < r(2L) && r(2L) < r(3L),
      s"expected templated < prose < noise, got $r")
  }

  test("deterministic across invocations and partitionings") {
    val docs = Tables.documents(spark, sf()).limit(50)
    def run(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"), TextAnalysis.deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(7))
  }

  test("null and empty text yield null, not a crash") {
    val got = Seq((1L, null: String), (2L, ""), (3L, "ok ok"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.deflateRatio(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(got.toSeq == Seq((1L, true), (2L, true), (3L, false)))
  }
}
