package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("session state survives across micro-batch runs via checkpoint") {
    val d = Files.createTempDirectory("graft-state")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    // memory sink refuses checkpoint recovery; parquet sink is the
    // fault-tolerant one, so closed sessions land in a directory table
    def runBatch(name: String, rows: Seq[(Long, Long)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (u, ms) => s"$u,$ms" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val events = spark.readStream
        .schema("user LONG, ms LONG")
        .option("delimiter", ",")
        .csv(in.toString)
        .as[StatefulSessions.Event]
      val q = StatefulSessions.sessionize(events, gapMs = 60000L)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def closedSoFar(): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(out)
        .select("user", "sessionId", "nEvents", "durMs")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

    // batch 1: user 7 has two events 10s apart (one open session);
    // user 8 one event
    runBatch("b1.csv", Seq((7L, 0L), (7L, 10000L), (8L, 5000L)))
    assert(closedSoFar().isEmpty) // nothing closed yet

    // batch 2: user 7 event 10 min later -> closes session 1 (n=2,
    // dur=10s); user 8 event within gap -> still open
    runBatch("b2.csv", Seq((7L, 600000L), (8L, 15000L)))
    assert(closedSoFar() == Set((7L, 1L, 2L, 10000L)))

    // batch 3: far-future events close user 7's session 2 and user 8's
    // session 1 (n=2: events at 5s and 15s)
    runBatch("b3.csv", Seq((7L, 99000000L), (8L, 99000000L)))
    val all = closedSoFar().map(t => (t._1, t._2, t._3))
    assert(all.contains((7L, 2L, 1L)))
    assert(all.contains((8L, 1L, 2L)))
  }

  test("streaming sessions == batch sessionized groups on the same events") {
    // real events; a per-user far-future sentinel closes every real
    // session so the streaming side emits them all (the sentinel opens
    // a fresh session that stays in state and is never emitted)
    val real = Seq(
      (1L, 0L), (1L, 10000L), (1L, 200000L),       // gap at 60s: 2 sessions
      (2L, 5000L), (2L, 50000L), (2L, 70000L),     // chained: 1 session
      (3L, 42L))                                   // singleton
    val sentinel = real.map(_._1).distinct.map(u => (u, 999999999L))

    val d = Files.createTempDirectory("graft-parity")
    val in = d.resolve("in"); Files.createDirectories(in)
    Files.write(in.resolve("all.csv"),
      (real ++ sentinel).map { case (u, ms) => s"$u,$ms" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    val out = d.resolve("out").toString
    val q = StatefulSessions.sessionize(
        spark.readStream.schema("user LONG, ms LONG").csv(in.toString)
          .as[StatefulSessions.Event],
        gapMs = 60000L)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("user", "sessionId", "nEvents", "durMs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val batch = graft.operators.EventAnalytics.sessionized(
        real.zipWithIndex.map { case ((u, ms), i) => (u, i.toLong, ms) }
          .toDF("user_id", "event_id", "ms"), gapMs = 60000L)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n"), (max($"ms") - min($"ms")).as("dur"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(streamed == batch)
  }
}
