package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.AttributionJoin

/** Watermarked stream-stream join: match semantics and late-row
  * eviction. */
class AttributionJoinSpec extends SparkSpec {

  private def harness() = new {
    val d = Files.createTempDirectory("graft-attr")
    val vin = d.resolve("v"); Files.createDirectories(vin)
    val cin = d.resolve("c"); Files.createDirectories(cin)
    val out = d.resolve("out").toString
    val ckpt = d.resolve("ckpt").toString
    private var n = 0

    def feed(views: Seq[(Long, Long)], clicks: Seq[(Long, Long)]): Unit = {
      def write(dir: java.nio.file.Path, rows: Seq[(Long, Long)]): Unit =
        Files.write(dir.resolve(s"b$n.csv"),
          (rows.map { case (u, ms) => s"$u,$ms" }.mkString("\n") + "\n")
            .getBytes(StandardCharsets.UTF_8))
      write(vin, views); write(cin, clicks); n += 1
      val v = spark.readStream.schema("user LONG, ms LONG").csv(vin.toString)
      val c = spark.readStream.schema("user LONG, ms LONG").csv(cin.toString)
      val q = AttributionJoin.run(v, c, windowMs = 10000L, delayMs = 5000L)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def pairs(): Set[(Long, Long, Long)] =
      spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
  }

  test("clicks join the views they follow within the window, per user") {
    val h = harness()
    h.feed(
      views = Seq((1L, 1000L), (1L, 20000L), (2L, 1000L)),
      clicks = Seq(
        (1L, 5000L),   // in (1000, 11000]  -> matches view@1000
        (1L, 25000L),  // in (20000, 30000] -> matches view@20000
        (1L, 40000L),  // beyond every window -> no match
        (2L, 900L),    // before the view     -> no match
        (3L, 5000L)))  // user without views  -> no match
    assert(h.pairs() == Set(
      (1L, 1000L, 5000L),
      (1L, 20000L, 25000L)))
  }

  test("a click matches EVERY view in range (inner join, not first-touch)") {
    val h = harness()
    h.feed(
      views = Seq((5L, 1000L), (5L, 2000L)),
      clicks = Seq((5L, 3000L)))
    assert(h.pairs() == Set((5L, 1000L, 3000L), (5L, 2000L, 3000L)))
  }

  test("rows later than the watermark are dropped, not joined") {
    val h = harness()
    // batch 1 pushes both watermarks to ~95s
    h.feed(views = Seq((9L, 100000L)), clicks = Seq((9L, 100000L)))
    // batch 2: a view and click pair far BEFORE the watermark — a
    // batch engine would match them; the stream must drop them
    h.feed(views = Seq((7L, 1000L)), clicks = Seq((7L, 2000L)))
    // batch 3: advance time again so any buffered state flushes
    h.feed(views = Seq((8L, 200000L)), clicks = Seq((8L, 201000L)))
    val got = h.pairs()
    assert(got.contains((8L, 200000L, 201000L)))
    assert(!got.exists(_._1 == 7L), s"late rows joined: $got")
  }
}
