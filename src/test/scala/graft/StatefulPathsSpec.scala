package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulPaths

/** Streaming session paths (q140's twin): emission-on-close, path cap,
  * and batch parity for order-respecting batch boundaries.
  */
class StatefulPathsSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(
      d: java.nio.file.Path,
      batches: Seq[Seq[(Long, Long, Long, String)]]): Unit = {
    val in = d.resolve("in"); Files.createDirectories(in)
    batches.zipWithIndex.foreach { case (rows, i) =>
      Files.write(in.resolve(f"b$i%02d.csv"),
        rows.map { case (u, id, ms, et) => s"$u,$id,$ms,$et" }
          .mkString("\n").getBytes(StandardCharsets.UTF_8))
      val q = StatefulPaths.sessionize(
          spark.readStream
            .schema("user LONG, eventId LONG, ms LONG, et STRING")
            .csv(in.toString)
            .as[StatefulPaths.Event],
          gapMs = 60000L, maxLen = 3)
        .writeStream.format("parquet")
        .option("path", d.resolve("out").toString)
        .outputMode("append")
        .option("checkpointLocation", d.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
  }

  private def closed(d: java.nio.file.Path): Set[(Long, Long, Long, String)] =
    spark.read.parquet(d.resolve("out").toString)
      .select("user", "sessionId", "nEvents", "path")
      .as[(Long, Long, Long, String)].collect().toSet

  test("paths cap at maxLen, order by (ms, eventId), close on gap") {
    val d = Files.createTempDirectory("graft-paths")
    runBatches(d, Seq(
      // session 1: five events (cap 3); same-ms tie decided by id
      Seq((1L, 2L, 100L, "b"), (1L, 1L, 100L, "a"), (1L, 3L, 200L, "c"),
        (1L, 4L, 300L, "d"), (1L, 5L, 400L, "e"),
        // session closes via the gap; new session opens
        (1L, 6L, 500000L, "z"))))
    assert(closed(d) == Set((1L, 1L, 5L, "a>b>c")))
  }

  test("batch parity: streaming closed paths == batch sessionPaths groups") {
    val rows = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 1000L, "click"),
      (1L, 3L, 200000L, "view"), (1L, 4L, 201000L, "purchase"),
      (2L, 5L, 0L, "signup"), (2L, 6L, 30000L, "view"))
    val sentinel = rows.map(_._1).distinct
      .map(u => (u, 999L, 99000000L, "end"))
    val d = Files.createTempDirectory("graft-paths2")
    // two order-respecting batches + the closing sentinel batch
    runBatches(d, Seq(rows.take(3), rows.drop(3), sentinel))
    val streamed = closed(d)
      .map(t => (t._1, t._2, t._4))

    val batch = graft.operators.EventAnalytics.sessionized(
        rows.map { case (u, id, ms, et) => (u, id, et, ms) }
          .toDF("user_id", "event_id", "event_type", "ms"),
        gapMs = 60000L)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"session_id")
          .orderBy($"ms", $"event_id")))
      .filter($"rn" <= 3)
      .groupBy($"user_id", $"session_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"ms", $"event_id", $"event_type"))),
        x => x.getField("event_type")), ">").as("path"))
      .as[(Long, Long, String)].collect().toSet

    assert(streamed == batch)
  }
}
