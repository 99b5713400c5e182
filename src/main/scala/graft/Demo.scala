package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.{EventsCsv, SqlExport}
import graft.streaming.LogStream

/** End-to-end usage example (and runtime smoke surface): synthesizes a
  * mail log, runs the batch-incremental pipeline twice, the report
  * aggregates, the SQL export, and the streaming variant.
  *
  *   sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val d = Files.createTempDirectory("graft-demo")
    val log = d.resolve("mail.log")
    Files.write(log, (Seq(
      "Jun  7 08:00:01 mx1 postfix/smtpd[11]: warning: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Jun  7 08:00:02 mx1 postfix/smtpd[11]: warning: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Jun  7 08:01:00 mx1 postfix/smtpd[12]: warning: unknown[172.16.3.9]: SASL PLAIN authentication failed, sasl_username=admin",
      "Jun  7 08:02:00 mx1 postfix/qmgr[99]: F00: removed (noise, dropped)")
      .mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

    val geo = Pipeline.GeoDims(
      country = Seq((167772160L, 184549375L, "US")).toDF("lo", "hi", "country_code"),
      asn = Seq((167772160L, 184549375L, 64500L, "EXAMPLE-NET")).toDF("lo", "hi", "asn", "aso"))

    val csv = d.resolve("events").toString
    val n1 = Pipeline.runIncremental(spark, log, d.resolve("offset"), csv, 2025, Some(geo))
    println(s"[demo] first incremental run extracted $n1 events")

    Files.write(log,
      ("Jun  8 09:00:00 mx2 postfix/smtpd[13]: warning: unknown[10.0.0.6]: SASL LOGIN authentication failed, sasl_username=root\n")
        .getBytes(StandardCharsets.UTF_8), java.nio.file.StandardOpenOption.APPEND)
    val n2 = Pipeline.runIncremental(spark, log, d.resolve("offset"), csv, 2025, Some(geo))
    println(s"[demo] second run (tail only) extracted $n2 events")

    val events = EventsCsv.read(spark, csv)
    println(s"[demo] events table now has ${events.count()} rows:")
    events.orderBy("date", "ip").show(truncate = false)

    val aggs = Pipeline.reportAggregates(events, "07/06/2025")
    println(s"[demo] total today: ${aggs("total_today").collect().head.getLong(0)}")
    println("[demo] top users today:")
    aggs("top10_usernames").show()

    import SqlExport._
    val specs = Seq(
      ColumnSpec("server", "server", StrKind, notNull = true),
      ColumnSpec("user", "username", StrKind, notNull = true),
      ColumnSpec("asn", "asn_int", IntKind, notNull = false))
    SqlExport.export(events, "maillogsentinel_events", specs) match {
      case Right(lines) =>
        println("[demo] sql export (first 4 lines):")
        lines.collect().take(4).foreach(l => println(s"  $l"))
      case Left(v) => println(s"[demo] sql export aborted: $v violations")
    }

    // 100-TB layout: date-partitioned parquet + partition-pruned slice
    val tableDir = d.resolve("events-table").toString
    graft.sources.EventsTable.append(events, tableDir)
    val slice = graft.sources.EventsTable.day(spark, tableDir, "2025-06-08")
    println(s"[demo] partitioned table day-slice rows: ${slice.count()}")
    println("[demo] anonymized sample:")
    graft.operators.Anonymize.anonymizeEvents(events)
      .select("server", "ip", "user").orderBy("server", "ip").show(3, truncate = false)

    val streamOut = d.resolve("stream-out").toString
    LogStream.runToCompletion(LogStream.toCsv(
      LogStream.events(spark, d.toString + "/*.log", 2025, Some(geo)),
      streamOut, d.resolve("ckpt").toString))
    println(s"[demo] streaming pipeline wrote ${EventsCsv.read(spark, streamOut).count()} rows")

    spark.stop()
  }
}
