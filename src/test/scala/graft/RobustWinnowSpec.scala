package graft

/** q231's robust-winnowing tie rule, pinned on text the driver corpus
  * never produces (its synthetic docs have no duplicate gram hashes
  * inside any w = 4 window, so the suite-level saved_ppm is 0): a run
  * of identical tokens makes EVERY window an all-ways tie, where
  * standard winnowing charts every rightmost position (one per
  * window) while the robust rule keeps the previous selection until
  * it slides out — one position per w windows, the Schleimer §5
  * index-size argument in its purest form. */
class RobustWinnowSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("robust-winnow").toString
    import scala.jdk.CollectionConverters._
    val rep = ("w " * 20).trim // 20 identical tokens
    val uniq = (1 to 20).map(i => s"t$i").mkString(" ")
    val rows = Seq(
      org.apache.spark.sql.Row(1L, rep, "en", "rep", rep.length.toLong),
      org.apache.spark.sql.Row(2L, uniq, "en", "uniq",
        uniq.length.toLong)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("all-tie run: robust keeps 1 position per w windows, std charts every window") {
    // 20 tokens → 17 grams → 14 windows. Standard: rightmost of every
    // window = positions 4..17 (14 distinct). Robust: seed at 4, kept
    // while >= j, re-charted at 8, 12, 16 → exactly 4 positions.
    val rows = Queries.all("q231_robust_winnow")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val rep = rows("rep")
    assert(rep.getLong(rep.fieldIndex("n_windows")) == 14L)
    assert(rep.getLong(rep.fieldIndex("std_positions")) == 14L)
    assert(rep.getLong(rep.fieldIndex("robust_positions")) == 4L)
    assert(rep.getLong(rep.fieldIndex("saved_ppm")) == 714285L)
  }

  test("distinct tokens: no ties, robust == standard") {
    val rows = Queries.all("q231_robust_winnow")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = rows("uniq")
    assert(u.getLong(u.fieldIndex("std_positions")) ==
      u.getLong(u.fieldIndex("robust_positions")))
    assert(u.getLong(u.fieldIndex("saved_ppm")) == 0L)
  }
}
