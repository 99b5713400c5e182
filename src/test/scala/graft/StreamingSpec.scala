package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.EventsCsv
import graft.streaming.LogStream

class StreamingSpec extends SparkSpec {

  test("streaming extract: log dir -> csv sink via checkpoint, end-to-end") {
    val d = Files.createTempDirectory("graft-stream")
    val logDir = d.resolve("logs"); Files.createDirectories(logDir)
    Files.write(logDir.resolve("mail.log"),
      ("Apr  1 10:00:00 mx postfix/smtpd[1]: warning: unknown[10.1.1.1]: " +
        "SASL LOGIN authentication failed, sasl_username=eve\n" +
        "Apr  1 10:00:01 mx noise line\n")
        .getBytes(StandardCharsets.UTF_8))
    val ev = LogStream.events(spark, logDir.toString + "/*", 2025)
    val out = d.resolve("out").toString
    LogStream.runToCompletion(
      LogStream.toCsv(ev, out, d.resolve("ckpt").toString))
    val back = EventsCsv.read(spark, out)
    assert(back.count() == 1)
    assert(back.collect().head.getAs[String]("user") == "eve")

    // second batch: new file appears; checkpoint ensures only it is read
    Files.write(logDir.resolve("mail2.log"),
      ("Apr  1 11:00:00 mx postfix/smtpd[2]: warning: unknown[10.1.1.2]: " +
        "SASL LOGIN authentication failed, sasl_username=mallory\n")
        .getBytes(StandardCharsets.UTF_8))
    val ev2 = LogStream.events(spark, logDir.toString + "/*", 2025)
    LogStream.runToCompletion(
      LogStream.toCsv(ev2, out, d.resolve("ckpt").toString))
    val all = EventsCsv.read(spark, out)
    assert(all.count() == 2)
  }

  test("windowed daily counts with watermark emit per-day totals") {
    val d = Files.createTempDirectory("graft-stream2")
    val logDir = d.resolve("logs"); Files.createDirectories(logDir)
    Files.write(logDir.resolve("m.log"),
      (Seq(
        "May  1 10:00:00 mx p[1]: unknown[10.0.0.1]: SASL x failed, sasl_username=a",
        "May  1 11:00:00 mx p[1]: unknown[10.0.0.1]: SASL x failed, sasl_username=a",
        "May  2 10:00:00 mx p[1]: unknown[10.0.0.2]: SASL x failed, sasl_username=b")
        .mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    val ev = LogStream.events(spark, logDir.toString + "/*", 2025)
      .withColumn("ts", to_timestamp(col("date"), "dd/MM/yyyy HH:mm"))
    val counts = LogStream.dailyCounts(ev, "ts")
    // update mode: emits every updated window per micro-batch (append
    // would emit nothing here — the watermark only advances after the
    // single AvailableNow batch, so no window is finalized within it)
    val q = counts.writeStream.format("memory").queryName("daily")
      .outputMode("update")
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("daily").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day").toString.take(10),
        r.getAs[String]("user"), r.getAs[Long]("n"))).toSet
    assert(rows == Set(
      ("2025-05-01", "a", 2L),
      ("2025-05-02", "b", 1L)))
  }

  test("beyond-watermark late rows are dropped, watermark survives restart") {
    val d = Files.createTempDirectory("graft-stream3")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString

    // foreachBatch (supports checkpoint recovery, unlike the memory
    // sink); updates land in a driver-side buffer per run
    def run(file: String, rows: Seq[String]): (Long, Set[(String, String, Long)]) = {
      Files.write(in.resolve(file),
        (rows.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      val ev = spark.readStream
        .schema("ts TIMESTAMP, user STRING")
        .option("delimiter", ";")
        .csv(in.toString)
      val buf = scala.collection.mutable.Set[(String, String, Long)]()
      val q = LogStream.dailyCounts(ev, "ts") // watermark "2 days"
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => buf.synchronized {
            buf += ((r.getAs[java.sql.Timestamp]("day").toString.take(10),
              r.getAs[String]("user"), r.getAs[Long]("n")))
          })
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dropped = q.recentProgress.map(p =>
        p.stateOperators.headOption.fold(0L)(_.numRowsDroppedByWatermark)).sum
      (dropped, buf.toSet)
    }
    // run 1: days 10 and 12 -> watermark advances to day 12 - 2d = day 10
    val (d1, out1) = run("b1.csv", Seq(
      "2025-05-10 10:00:00;a", "2025-05-12 10:00:00;a"))
    assert(d1 == 0L)
    assert(out1 == Set(("2025-05-10", "a", 1L), ("2025-05-12", "a", 1L)))

    // run 2 (fresh query, same checkpoint): a day-1 row is 9 days below
    // the RECOVERED watermark -> dropped by the state operator; the
    // on-time day-12 row still updates its window
    val (d2, out2) = run("b2.csv", Seq(
      "2025-05-01 09:00:00;z", "2025-05-12 11:00:00;a"))
    assert(d2 == 1L, s"expected 1 late row dropped, got $d2")
    assert(out2 == Set(("2025-05-12", "a", 2L)), out2.toString)
  }
}
