package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingWinnowDecontam, StreamingWinnowScreen}

/** Stream == batch for the winnow-based decontamination screen: the
  * streamed ≥2-shared-fingerprint hit set against a static benchmark
  * index equals the uncapped batch screen for any slicing, with a
  * brand-new query per slice (state recovery) and out-of-order
  * arrival; each hit is emitted exactly once across slices. */
class StreamingWinnowDecontamSpec extends SparkSpec {
  import spark.implicits._

  /** q234's benchmark convention on a small id range: every 13th doc,
    * truncated, offset into the bench id space. */
  private def benchAll: DataFrame = Tables.documents(spark, sf())
    .filter(col("doc_id") < 260 && col("doc_id") % 13 === 0)
    .select((col("doc_id") + 1000000000000L).as("doc_id"),
      expr("substr(text, 1, greatest(length(text)-40, 50))").as("text"))

  private def docsAll: DataFrame = Tables.documents(spark, sf())
    .filter(col("doc_id") < 260)
    .select(col("doc_id"), col("text"))

  /** Uncapped batch screen: train fps × bench fps, ≥2 distinct shared. */
  private def batchHits(docs: DataFrame): Set[(Long, Long)] = {
    val t = StreamingWinnowScreen
      .fingerprintsNarrow(docs, "doc_id", "text")
      .select(col("docId").as("train_id"), col("fp"))
    val b = StreamingWinnowDecontam.benchIndex(benchAll, "doc_id", "text")
    t.join(b, "fp")
      .groupBy(col("train_id"), col("benchId"))
      .agg(count(lit(1)).as("nsh"))
      .filter(col("nsh") >= 2)
      .select(col("train_id"), col("benchId"))
      .as[(Long, Long)].collect().toSet
  }

  private def runSlicing(tag: String,
                         slices: Seq[DataFrame => DataFrame]): Unit = {
    val d = Files.createTempDirectory(s"graft-swd-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    val benchIdx = StreamingWinnowDecontam
      .benchIndex(benchAll, "doc_id", "text").localCheckpoint()

    var ingested: Option[DataFrame] = None
    for ((slice, i) <- slices.zipWithIndex) {
      val part = slice(docsAll)
      part.coalesce(1).write.mode("append").parquet(in.toString)
      ingested = Some(ingested.fold(part)(_.union(part)))

      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = StreamingWinnowDecontam
        .hits(stream, "doc_id", "text", benchIdx)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val emitted = spark.read.parquet(out)
        .as[(Long, Long)].collect()
      assert(emitted.length == emitted.distinct.length,
        s"$tag slice $i: a hit was emitted more than once")
      val reference = batchHits(ingested.get)
      assert(emitted.toSet == reference,
        s"$tag slice $i: streamed hit set != uncapped batch screen")
    }
    assert(batchHits(ingested.get).nonEmpty,
      s"$tag: the bench set must actually contaminate")
  }

  test("hit set equals the batch screen after every slice") {
    runSlicing("asc", Seq(
      _.filter(col("doc_id") < 90),
      _.filter(col("doc_id") >= 90 && col("doc_id") < 180),
      _.filter(col("doc_id") >= 180)))
  }

  test("parity holds for out-of-order arrival") {
    runSlicing("desc", Seq(
      _.filter(col("doc_id") >= 180),
      _.filter(col("doc_id") >= 90 && col("doc_id") < 180),
      _.filter(col("doc_id") < 90)))
  }

  /** Batch reference for the FULL pipeline: uncapped screen then
    * q234's containment rule (≥ minPpm of the bench doc's fps present
    * in the train doc). */
  private def batchConfirmed(docs: DataFrame): Set[(Long, Long)] = {
    val t = StreamingWinnowScreen
      .fingerprintsNarrow(docs, "doc_id", "text")
      .select(col("docId").as("train_id"), col("fp"))
    val b = StreamingWinnowDecontam.benchIndex(benchAll, "doc_id", "text")
    val cand = t.join(b, "fp")
      .groupBy(col("train_id"), col("benchId"))
      .agg(count(lit(1)).as("nsh")).filter(col("nsh") >= 2)
      .select(col("train_id"), col("benchId").as("bench_id"))
    val inter = t.join(cand, "train_id")
      .join(b.select(col("benchId").as("bench_id"), col("fp")),
        Seq("bench_id", "fp"))
      .groupBy(col("train_id"), col("bench_id")).agg(count(lit(1)).as("i"))
    val szb = b.groupBy(col("benchId")).agg(count(lit(1)).as("szb"))
    inter.join(szb.select(col("benchId").as("bench_id"), col("szb")),
        "bench_id")
      .filter(expr("i * 1000000 div szb") >= 500000L)
      .select(col("train_id"), col("bench_id"))
      .as[(Long, Long)].collect().toSet
  }

  test("composed pipeline live: screen -> foreachBatch confirm == batch") {
    val d = Files.createTempDirectory("graft-swd-conf")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val benchIdx = StreamingWinnowDecontam
      .benchIndex(benchAll, "doc_id", "text").localCheckpoint()
    // the STORED corpus fingerprint index (what an index-maintaining
    // pipeline has on hand; the confirm never re-reads train text)
    val trainFp = StreamingWinnowScreen
      .fingerprintsNarrow(docsAll, "doc_id", "text").localCheckpoint()

    val slices: Seq[DataFrame => DataFrame] = Seq(
      _.filter(col("doc_id") >= 180), // out-of-order on purpose
      _.filter(col("doc_id") < 90),
      _.filter(col("doc_id") >= 90 && col("doc_id") < 180))
    var confirmed = Vector.empty[(Long, Long)]
    var ingested: Option[DataFrame] = None
    for ((slice, i) <- slices.zipWithIndex) {
      val part = slice(docsAll)
      part.coalesce(1).write.mode("append").parquet(in.toString)
      ingested = Some(ingested.fold(part)(_.union(part)))
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = StreamingWinnowDecontam
        .confirmedWriter(stream, "doc_id", "text", benchIdx, trainFp) {
          batch => confirmed ++= batch.as[(Long, Long)].collect()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(confirmed.size == confirmed.distinct.size,
        s"slice $i: a confirmed link surfaced twice")
      assert(confirmed.toSet == batchConfirmed(ingested.get),
        s"slice $i: live confirmed set != batch screen+confirm")
    }
    assert(confirmed.nonEmpty, "the composition must confirm something")
  }
}
