package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingCapCalibration, StreamingWinnowScreen}

/** The live cap monitor certified: after every micro-batch the
  * emitted adaptive cap equals q250's batch formula
  * ceil(DfCap · distinct docs / distinct texts) over everything
  * ingested — for ascending and duplication-first slicings, with a
  * brand-new query per slice against the same checkpoint (restart
  * recovery), and with a replayed append (the at-least-once case)
  * leaving the cap unchanged. */
class StreamingCapCalibrationSpec extends SparkSpec {
  import spark.implicits._

  // 10 unique texts; docs 100+ are exact copies cycling those texts,
  // so the multiplicity (and the cap) RISES as the crawl duplicates
  private def text(k: Long): String =
    (0 until 12).map(i => s"w${k}x$i").mkString(" ")
  private val corpus: Seq[(Long, String)] =
    (0L to 9L).map(i => (i, text(i))) ++
      (100L to 129L).map(i => (i, text(i % 10)))

  private def batchCap(rows: Seq[(Long, String)]): Long = {
    if (rows.isEmpty) return StreamingWinnowScreen.DfCap.toLong
    val n = rows.map(_._1).distinct.size.toLong
    val m = rows.map(_._2).distinct.size.toLong
    (StreamingWinnowScreen.DfCap * n + m - 1L) / m
  }

  private def runSlicing(tag: String,
                         slices: Seq[Seq[(Long, String)]]): Seq[Long] = {
    val d = Files.createTempDirectory(s"graft-capcal-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val store = d.resolve("store").toString
    var ingested = Seq.empty[(Long, String)]
    val caps = Seq.newBuilder[Long]
    for ((slice, i) <- slices.zipWithIndex) {
      slice.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in.toString)
      ingested = ingested ++ slice
      var live: Option[Long] = None
      val q = StreamingCapCalibration
        .capWriter(
          spark.readStream.schema("doc_id LONG, text STRING")
            .parquet(in.toString),
          "doc_id", "text", store) { (cap, _) => live = Some(cap) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val reference = batchCap(ingested)
      assert(live.contains(reference),
        s"$tag slice $i: live cap $live != batch formula $reference")
      caps += reference
    }
    caps.result()
  }

  test("live cap tracks the batch formula as duplication grows") {
    val caps = runSlicing("asc", Seq(
      corpus.filter(_._1 < 10),            // 10 unique: cap = DfCap
      corpus.filter(t => t._1 >= 100 && t._1 < 110), // 2x copies
      corpus.filter(_._1 >= 110)))         // 4x copies
    assert(caps(0) == StreamingWinnowScreen.DfCap.toLong,
      "an organic prefix must reproduce the fixed cap")
    assert(caps(1) == 32L && caps(2) == 64L,
      "the cap must scale with the measured multiplicity (2x, 4x)")
  }

  test("duplication-first arrival and idempotent replay") {
    val caps = runSlicing("dupfirst", Seq(
      corpus.filter(t => t._1 >= 100 && t._1 < 120), // 20 copies of 10
      corpus.filter(_._1 < 10),            // originals arrive late
      corpus.filter(_._1 >= 120)))
    assert(caps(0) == 32L, "20 docs over 10 texts: cap 32")
    assert(caps(2) == 64L, "final cap independent of arrival order")
    // at-least-once: re-append a batch's rows directly to the store
    // (the foreachBatch replay case) — distinct counts absorb it
    val d = Files.createTempDirectory("graft-capcal-replay")
    val store = d.resolve("store").toString
    corpus.toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .write.mode("append").parquet(store)
    val once = StreamingCapCalibration.capFromStore(spark, store)
    corpus.take(15).toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .write.mode("append").parquet(store)
    assert(StreamingCapCalibration.capFromStore(spark, store) == once,
      "a replayed append must not change the cap")
  }

  test("empty store falls back to the fixed cap") {
    val d = Files.createTempDirectory("graft-capcal-empty")
    assert(StreamingCapCalibration.capFromStore(
      spark, d.resolve("nope").toString) ==
      StreamingWinnowScreen.DfCap.toLong)
  }
}
