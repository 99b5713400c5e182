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

  test("state TTL bounds the dedup horizon: expired keepers are forgotten") {
    val d = Files.createTempDirectory("graft-sdedup-ttl")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString

    // ONE continuous query (default micro-batch trigger): stateful
    // queries run no-data micro-batches, which is what fires the
    // processing-time timers between files. (AvailableNow would hang:
    // a pending state timer counts as outstanding work, so the query
    // never self-terminates — don't mix the two.)
    def addFile(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    def verdictsSoFar(): Set[(Long, Long, Boolean)] =
      spark.read.parquet(out)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keeper"),
          r.getAs[Boolean]("is_duplicate")))
        .toSet
    def awaitVerdicts(n: Int): Set[(Long, Long, Boolean)] = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        (try verdictsSoFar().size < n catch { case _: Throwable => true }))
        Thread.sleep(100)
      verdictsSoFar()
    }

    addFile("b1.csv", Seq((1L, "ephemeral text")))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("delimiter", ";")
      .csv(in.toString)
    val q = StreamingDedup.verdicts(docs, "doc_id", "text",
        stateTtlMs = Some(100L))
      .writeStream.format("parquet")
      .option("path", out)
      .outputMode("append")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .start()
    try {
      assert(awaitVerdicts(1) == Set((1L, 1L, false)))
      // let the 100ms TTL lapse (no-data micro-batches evict the
      // keeper), then resend the SAME content under a new id: it must
      // be treated as new — its own keeper, not doc 1's duplicate
      Thread.sleep(3000)
      addFile("b2.csv", Seq((8L, "ephemeral text")))
      assert(awaitVerdicts(2) == Set((1L, 1L, false), (8L, 8L, false)))
    } finally {
      q.stop()
      q.awaitTermination()
    }
  }
}
