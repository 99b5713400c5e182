package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextAnalysis
import graft.plans.NfcNormalizeExpr

/** Streaming parity for the narrow curation operators: because quality
  * signals, language ID, token stats and NFC normalization are pure
  * per-row column expressions (no aggregation, no state), the SAME
  * transform function runs under readStream without modification —
  * batch/stream parity is by construction, and this spec pins it. */
class StreamingCurationSpec extends SparkSpec {

  // the per-doc curation projection under test — one definition, both modes
  private def curate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      NfcNormalizeExpr.nfc(col("text")).as("norm"),
      TextAnalysis.langGuess(col("text")).as("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("tok"),
      TextAnalysis.repetitionRatio(col("text")).as("rep"),
      (TextAnalysis.qualityScore(col("text")) >= 0.5).as("keep"))

  test("batch and streaming runs of the same projection agree row-for-row") {
    val d = Files.createTempDirectory("graft-scur")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString

    val rows = Seq(
      (1L, "the quick brown fox is one of the fast animals in the field"),
      (2L, "word word word word word word word word"),
      (3L, "cafe\u0301 naive text with a e\u0301 accent to normalize"),
      (4L, "short"))
    Files.write(in.resolve("docs.csv"),
      rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema)
      .option("delimiter", ";").csv(in.toString)
    val q = curate(stream)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val batch = spark.read.schema(schema)
      .option("delimiter", ";").csv(in.toString)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSet
    val want = curate(batch).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSet
    assert(got == want)
    assert(got.size == 4)
    // the NFC leg actually normalized (doc 3 shrank by its 2 marks)
    val norm3 = got.find(_._1 == 3L).get._2
    assert(norm3.contains("caf\u00e9") && norm3.contains("\u00e9 accent"))
  }
}
