package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingDecontam

/** Stream-static decontamination screen: arriving docs flagged against
  * a fixed benchmark band index, across micro-batches, with the hit
  * set equal to the batch cross-set candidate screen on the same
  * corpus. */
class StreamingDecontamSpec extends SparkSpec {

  // bench doc 100 is a tail-trim of train doc 1 (near-dup, must hit);
  // bench doc 101 is unrelated text (must not hit anything)
  private val trainDocs: Seq[(Long, String)] = Seq(
    1L -> ("the quick brown fox jumps over the lazy dog again and " * 4),
    2L -> ("an entirely different document about spark partitions " * 4),
    3L -> ("yet another unrelated piece of text with its own words " * 4))
  private val benchDocs: Seq[(Long, String)] = Seq(
    100L -> ("the quick brown fox jumps over the lazy dog again and " * 4)
      .dropRight(10),
    101L -> ("benchmark questions nobody leaked anywhere at all here " * 4))

  test("cross-batch stream hits equal the batch cross-set screen") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-sdecon")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    val benchIdx = StreamingDecontam.benchIndex(
      benchDocs.toDF("doc_id", "text"), "doc_id", "text")
      .localCheckpoint()

    def runBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("delimiter", ";")
        .csv(in.toString)
      val q = StreamingDecontam.hits(stream, "doc_id", "text", benchIdx)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runBatch("b1.csv", trainDocs.take(2))
    runBatch("b2.csv", trainDocs.drop(2))

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id")))
      .toSet

    // batch twin: incremental screen of the train delta against the
    // stored benchmark band index (same scheme), cross-set pairs only
    val trainBands = Dedup.lshBandKeysNarrow(
      trainDocs.toDF("doc_id", "text"), "doc_id", "text", 5, 8, 2)
    val expected = trainBands
      .join(benchIdx, "bk")
      .select(col("doc_id"), col("bench_id"))
      .distinct()
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id")))
      .toSet

    assert(got == expected)
    assert(got.contains((1L, 100L)), "near-dup benchmark copy must hit")
    assert(!got.exists(_._2 == 101L), "unrelated benchmark must not hit")
    assert(!got.exists(p => p._1 != 1L && p._2 == 100L),
      "unrelated train docs must not hit")
  }

  test("the hit stream never shuffles text and the static side broadcasts") {
    import spark.implicits._
    val benchIdx = StreamingDecontam.benchIndex(
      benchDocs.toDF("doc_id", "text"), "doc_id", "text")
      .localCheckpoint()
    // batch-mode plan of the same composition (streaming plans share
    // the per-batch physical shape)
    val df = StreamingDecontam.hits(
      trainDocs.toDF("doc_id", "text"), "doc_id", "text", benchIdx)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark index must broadcast:\n$p")
    val exchangeLines = p.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("Broadcast"))
      .toSeq
    assert(exchangeLines.forall(!_.contains("text#")),
      s"doc text in a shuffle:\n$p")
  }
}
