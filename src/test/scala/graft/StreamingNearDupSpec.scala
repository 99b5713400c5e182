package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("narrow band keys equal the groupBy band keys on real documents") {
    val docs = Tables.documents(spark, sf())
    val viaAgg = Dedup.lshBandKeysPlan(docs, "doc_id", "text", 5, 8, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaNarrow = Dedup.lshBandKeysNarrow(docs, "doc_id", "text", 5, 8, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaAgg.nonEmpty)
    assert(viaNarrow == viaAgg)
  }

  test("streaming star edges link near-dups across micro-batches") {
    val d = Files.createTempDirectory("graft-sneardup")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"

    def runBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("delimiter", ";")
        .csv(in.toString)
      val q = StreamingNearDup.starEdges(docs, "doc_id", "text",
          n = 5, k = 8, bands = 2)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def edges(): Set[(Long, Long)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    // batch 1: two exact copies share all bands -> hub 1 links 4;
    // doc 2 is unrelated text, no edge
    runBatch("b1.csv", Seq((1L, text), (4L, text),
      (2L, "completely different content with no overlap whatsoever")))
    assert(edges() == Set((1L, 4L)))

    // batch 2: another copy arrives later -> linked to the REMEMBERED
    // hub (1), not to a new per-batch hub
    runBatch("b2.csv", Seq((7L, text)))
    assert(edges() == Set((1L, 4L), (1L, 7L)))

    // downstream composition: batch connected components over the
    // accumulated edge stream yield one cluster {1,4,7}
    val comps = Dedup.connectedComponents(
        spark.read.parquet(out).select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps == Map(1L -> 1L, 4L -> 1L, 7L -> 1L))

    // restart recovery, stated explicitly: each runBatch above started a
    // BRAND-NEW query object against the same checkpoint — batch 2's
    // edge (1,7) could only name hub 1 if the bucket-hub state store was
    // recovered from the checkpoint, not rebuilt from the data (doc 1
    // was never re-read; a fresh hub would have been 7).
  }

  test("bucket-hub TTL bounds the linking horizon") {
    val d = Files.createTempDirectory("graft-sneardup-ttl")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"

    // One continuous query (default trigger): no-data micro-batches fire
    // the processing-time timers between files — same setup rationale as
    // StreamingDedupSpec's TTL case (AvailableNow would never terminate
    // with a pending timer).
    def addFile(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    def edgesSoFar(): Set[(Long, Long)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    def awaitEdges(n: Int): Set[(Long, Long)] = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        (try edgesSoFar().size < n catch { case _: Throwable => true }))
        Thread.sleep(100)
      edgesSoFar()
    }

    addFile("b1.csv", Seq((1L, text), (4L, text)))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("delimiter", ";")
      .csv(in.toString)
    val q = StreamingNearDup.starEdges(docs, "doc_id", "text",
        n = 5, k = 8, bands = 2, stateTtlMs = Some(100L))
      .writeStream.format("parquet")
      .option("path", out)
      .outputMode("append")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .start()
    try {
      assert(awaitEdges(1) == Set((1L, 4L)))
      // let the TTL lapse (hub 1 evicted), then send another copy: it
      // must start a FRESH hub — no edge to 1, and a doc arriving with
      // it links to the new hub, proving the bucket restarted cleanly
      Thread.sleep(3000)
      addFile("b2.csv", Seq((7L, text), (9L, text)))
      assert(awaitEdges(2) == Set((1L, 4L), (7L, 9L)))
    } finally {
      q.stop()
      q.awaitTermination()
    }
  }
}
