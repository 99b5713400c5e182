package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSnapshotDiff

class StreamingSnapshotDiffSpec extends SparkSpec {

  test("changelog verdicts track state across micro-batches + restarts") {
    val d = Files.createTempDirectory("graft-scdc")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    // csv: key;value;tomb
    def runBatch(name: String, rows: Seq[(Long, String, Boolean)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (k, v, t) => s"$k;$v;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val recs = spark.readStream
        .schema("key LONG, value STRING, tomb BOOLEAN")
        .option("delimiter", ";")
        .csv(in.toString)
      val q = StreamingSnapshotDiff.changes(recs, "key",
          compareCols = Seq("value"), tombstoneCol = Some("tomb"))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def verdicts(): Seq[(Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[String]("status")))
        .sortBy(x => (x._1, x._2)).toSeq

    // batch 1: two inserts
    runBatch("b1.csv", Seq((1L, "v1", false), (2L, "w1", false)))
    assert(verdicts() == Seq((1L, "added"), (2L, "added")))

    // batch 2 (new query object, same checkpoint — state recovered):
    // update key 1, same-value key 2, delete of unknown key 9 (silent)
    runBatch("b2.csv", Seq((1L, "v2", false), (2L, "w1", false),
      (9L, "", true)))
    assert(verdicts() == Seq((1L, "added"), (1L, "changed"),
      (2L, "added"), (2L, "unchanged")))

    // batch 3: tombstone key 1, then re-add it in a later batch
    runBatch("b3.csv", Seq((1L, "", true)))
    runBatch("b4.csv", Seq((1L, "v3", false)))
    assert(verdicts() == Seq((1L, "added"), (1L, "added"),
      (1L, "changed"), (1L, "removed"),
      (2L, "added"), (2L, "unchanged")))
  }

  test("state TTL: an expired key re-arrives as freshly added") {
    val d = Files.createTempDirectory("graft-scdc-ttl")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString

    // ONE continuous query: processing-time timers only fire in the
    // no-data micro-batches between files (AvailableNow would hang on
    // the pending timer — same caveat as StreamingDedupSpec)
    def addFile(name: String, rows: Seq[(Long, String, Boolean)]): Unit =
      Files.write(in.resolve(name),
        rows.map { case (k, v, t) => s"$k;$v;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    def verdicts(): Seq[(Long, String)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[String]("status")))
        .sortBy(x => (x._1, x._2)).toSeq
    def await(n: Int): Seq[(Long, String)] = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        (try verdicts().size < n catch { case _: Throwable => true }))
        Thread.sleep(100)
      verdicts()
    }

    addFile("b1.csv", Seq((5L, "v1", false)))
    val recs = spark.readStream
      .schema("key LONG, value STRING, tomb BOOLEAN")
      .option("delimiter", ";")
      .csv(in.toString)
    val q = graft.streaming.StreamingSnapshotDiff.changes(recs, "key",
        compareCols = Seq("value"), tombstoneCol = Some("tomb"),
        stateTtlMs = Some(100L))
      .writeStream.format("parquet")
      .option("path", out)
      .outputMode("append")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .start()
    try {
      assert(await(1) == Seq((5L, "added")))
      // let the TTL lapse; the same (key, value) must then read as a
      // fresh insert, not "unchanged" — the bounded-horizon trade
      Thread.sleep(3000)
      addFile("b2.csv", Seq((5L, "v1", false)))
      assert(await(2) == Seq((5L, "added"), (5L, "added")))
    } finally {
      q.stop(); q.awaitTermination()
    }
  }
}
