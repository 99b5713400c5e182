package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {

  test("dedup state survives micro-batches: later copies flag their keeper") {
    val d = Files.createTempDirectory("graft-sdedup")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    def runBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("delimiter", ";")
        .csv(in.toString)
      val q = StreamingDedup.verdicts(docs, "doc_id", "text")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def verdictsSoFar(): Set[(Long, Long, Boolean)] =
      spark.read.parquet(out)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keeper"),
          r.getAs[Boolean]("is_duplicate")))
        .toSet

    // batch 1: two distinct docs + an in-batch duplicate of doc 1
    runBatch("b1.csv", Seq((1L, "alpha text"), (2L, "beta text"),
      (5L, "alpha text")))
    assert(verdictsSoFar() == Set(
      (1L, 1L, false), (2L, 2L, false), (5L, 1L, true)))

    // batch 2: cross-batch duplicate of doc 1 (state remembered via
    // checkpoint) + a brand-new doc
    runBatch("b2.csv", Seq((9L, "alpha text"), (3L, "gamma text")))
    assert(verdictsSoFar() == Set(
      (1L, 1L, false), (2L, 2L, false), (5L, 1L, true),
      (9L, 1L, true), (3L, 3L, false)))
  }
}
