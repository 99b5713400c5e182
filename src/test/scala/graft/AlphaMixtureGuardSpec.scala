package graft

import org.apache.spark.sql.functions._

/** The q207 → q230 long-tail contract, demonstrated on a corpus the
  * driver's synthetic tables can't produce (5 roughly-even languages
  * never drive p_ppm to 0): one dominant language of >10⁶ tokens plus
  * a single-token language puts the tail under one-millionth of the
  * corpus, so q207's ppm-grid share is exactly 0 and its
  * boost = w_ppm·10⁶ div p_ppm must abort (ANSI DIVIDE_BY_ZERO — the
  * documented loud-and-symmetric failure), while q230's raw-mass
  * rational boost survives with the tail's real upweighting factor. */
class AlphaMixtureGuardSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("alpha-guard").toString
    val big = ("tok " * 1200000).trim // 1.2M tokens, one language
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, big, "maj", "web", big.length.toLong),
      org.apache.spark.sql.Row(2L, "solo", "tail", "web", 4L)).asJava
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

  test("q207 aborts loudly on a sub-ppm language (the documented hazard)") {
    val e = intercept[Exception] {
      Queries.all("q207_alpha_mixture")(spark, dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && (c.getMessage.contains("DIVIDE_BY_ZERO") ||
        c.getMessage.contains("Division by zero"))),
      s"expected a divide-by-zero abort, got: $e")
  }

  test("q230 survives the same corpus with the tail's real boost") {
    val rows = Queries.all("q230_alpha_mixture_guarded")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("maj", "tail"))
    val tail = rows("tail")
    assert(tail.getLong(tail.fieldIndex("p_ppm")) == 0L,
      "tail must be sub-ppm for the demonstration to bite")
    val boost = tail.getLong(tail.fieldIndex("boost_ppm"))
    // boost = (√1/Σ√)/(1/1200001·10⁻⁶ → raw) ≈ √(N_maj/N_tail) ≈ 1095×
    assert(boost > 100L * 1000000L,
      s"sub-ppm language must be strongly upweighted, got $boost ppm")
    val maj = rows("maj")
    assert(maj.getLong(maj.fieldIndex("boost_ppm")) < 1010000L,
      "the dominant language's boost must stay ≈1×")
  }
}
