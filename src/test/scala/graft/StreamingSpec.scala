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
}
