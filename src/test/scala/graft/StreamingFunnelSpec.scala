package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.Funnel
import graft.streaming.StreamingFunnel

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("s0", "s1", "s2")

  /** Run the stream in `nBatches` event-time-ordered slices, return
    * emitted conversions (user -> step times). */
  private def streamed(rows: Seq[(Long, Int, Long)], nBatches: Int,
                       maxGapMs: Long = -1L): Map[Long, Seq[Long]] = {
    val d = Files.createTempDirectory("graft-sfn")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    val ordered = rows.sortBy(_._3)
    val slices = ordered.grouped(
      math.max(1, (ordered.size + nBatches - 1) / nBatches)).toSeq
    slices.zipWithIndex.foreach { case (slice, i) =>
      Files.write(in.resolve(s"b$i.csv"),
        slice.map { case (u, st, ms) => s"$u,$st,$ms" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val events = spark.readStream
        .schema("user LONG, step INT, ms LONG")
        .csv(in.toString)
        .as[StreamingFunnel.Event]
      val q = StreamingFunnel.run(events, steps.length, maxGapMs)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .as[StreamingFunnel.Conversion]
      .collect().map(c => c.user -> c.times).toMap
  }

  private def batchConversions(rows: Seq[(Long, Int, Long)],
                               maxGapMs: Option[Long] = None): Map[Long, Seq[Long]] =
    Funnel.stepTimes(
        rows.map { case (u, st, ms) => (u, steps(st), ms) }
          .toDF("u", "et", "ms"),
        "u", "et", "ms", steps, maxGapMs)
      .collect()
      .filter(!_.isNullAt(steps.length)) // fully converted users only
      .map(r => r.getLong(0) -> (1 to steps.length).map(r.getLong(_)))
      .toMap

  private def corpus(seed: Int): Seq[(Long, Int, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to 600).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(3), rnd.nextInt(100000).toLong))
  }

  test("conversions equal the batch funnel for any stream slicing") {
    val rows = corpus(17)
    val want = batchConversions(rows)
    assert(want.nonEmpty, "fixture should produce conversions")
    assert(streamed(rows, nBatches = 1) == want)
    assert(streamed(rows, nBatches = 4) == want)
  }

  test("max-gap windows match the batch funnel across batches") {
    val rows = corpus(29)
    val want = batchConversions(rows, Some(5000L))
    val got = streamed(rows, nBatches = 3, maxGapMs = 5000L)
    assert(got == want)
    assert(got.size < batchConversions(rows).size,
      "the gap must disqualify some conversions")
  }

  /** Explicit-slice variant with a watermark on the event time — the
    * harness for the event-time state-timeout contract. */
  private def streamedSlices(slices: Seq[Seq[(Long, Int, Long)]],
                             idleTimeoutMs: Long): Map[Long, Seq[Long]] = {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val d = Files.createTempDirectory("graft-sfn-wm")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    slices.zipWithIndex.foreach { case (slice, i) =>
      Files.write(in.resolve(s"b$i.csv"),
        slice.map { case (u, st, ms) => s"$u,$st,$ms" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val events = spark.readStream
        .schema("user LONG, step INT, ms LONG")
        .csv(in.toString)
        .withColumn("ets", timestamp_millis(col("ms")))
        .withWatermark("ets", "0 milliseconds")
        .as[StreamingFunnel.Event]
      val q = StreamingFunnel.run(events, steps.length,
          maxGapMs = -1L, idleTimeoutMs = idleTimeoutMs)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .as[StreamingFunnel.Conversion]
      .collect().map(c => c.user -> c.times).toMap
  }

  test("idle state is evicted by the event-time timeout; NoTimeout keeps it") {
    // user 1 half-converts, goes idle while the watermark advances far
    // past the timeout (slice 3 carries only other-user traffic so the
    // timeout sweep runs), then completes the last step — with the
    // timeout the earlier steps are forgotten and NO conversion emits;
    // with the default NoTimeout the same slices convert
    val slices = Seq(
      Seq((1L, 0, 10L), (1L, 1, 20L), (2L, 0, 30L)),
      Seq((2L, 1, 500000L)),
      Seq((2L, 0, 600000L)),
      // slice 4 includes a LATE straggler (ms far below the 600000
      // watermark): its naive deadline would be below the watermark,
      // which Spark rejects — the clamp must keep the query alive
      Seq((1L, 2, 600100L), (3L, 0, 100L)))
    assert(streamedSlices(slices, idleTimeoutMs = 1000L) == Map.empty,
      "timed-out user must not convert from evicted state")
    assert(streamedSlices(slices, idleTimeoutMs = -1L) ==
      Map(1L -> Seq(10L, 20L, 600100L)),
      "NoTimeout control must still convert")
  }

  test("a user converts at most once") {
    // user 1 completes the funnel twice over; only one emission
    val rows = Seq(
      (1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L),
      (1L, 0, 40L), (1L, 1, 50L), (1L, 2, 60L))
    val got = streamed(rows, nBatches = 3)
    assert(got == Map(1L -> Seq(10L, 20L, 30L)))
  }
}
