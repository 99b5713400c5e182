package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.EventsCsv

/** End-to-end: synthesized log -> full extract -> CSV -> report aggs
  * (the reference's extraction+report integration tests,
  * test_parser.py:68-567 / test_report.py:75-483, re-shaped). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val logLines = Seq(
    "Mar  3 08:00:01 mx1 postfix/smtpd[11]: warning: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
    "Mar  3 08:00:02 mx1 postfix/smtpd[11]: warning: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
    "Mar  3 08:01:00 mx1 postfix/smtpd[12]: warning: unknown[192.168.0.9]: SASL PLAIN authentication failed, sasl_username=admin",
    "Mar  3 08:02:00 mx1 postfix/qmgr[99]: F00: removed",
    "Mar  4 09:00:00 mx2 postfix/smtpd[13]: warning: unknown[10.0.0.6]: SASL LOGIN authentication failed, sasl_username=root")

  private lazy val geo = Pipeline.GeoDims(
    country = Seq((167772160L, 184549375L, "US")).toDF("lo", "hi", "country_code"),
    asn = Seq((167772160L, 184549375L, 64500L, "EX-NET")).toDF("lo", "hi", "asn", "aso"))

  test("extract produces the canonical 9-column frame with sentinels") {
    val ev = Pipeline.extract(logLines.toDF("value"), 2025, Some(geo), None)
    assert(ev.columns.toSeq == EventsCsv.schema.fieldNames.toSeq)
    assert(ev.count() == 4) // qmgr noise dropped
    val r = ev.filter(col("ip") === "10.0.0.5").collect().head
    assert(r.getAs[String]("date") == "03/03/2025 08:00")
    assert(r.getAs[String]("country_code") == "US")
    assert(r.getAs[String]("asn") == "64500")
    assert(r.getAs[String]("hostname") == "null")
    val miss = ev.filter(col("ip") === "192.168.0.9").collect().head
    assert(miss.getAs[String]("country_code") == "N/A")
  }

  test("incremental run end-to-end: log file -> csv table, appends only new") {
    val d = Files.createTempDirectory("graft-e2e")
    val log = d.resolve("mail.log")
    Files.write(log, (logLines.take(3).mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    val csv = d.resolve("events").toString
    val n1 = Pipeline.runIncremental(spark, log, d.resolve("offset"), csv,
      2025, Some(geo))
    assert(n1 == 3)
    Files.write(log, (logLines(4) + "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.APPEND)
    val n2 = Pipeline.runIncremental(spark, log, d.resolve("offset"), csv,
      2025, Some(geo))
    assert(n2 == 1)
    assert(EventsCsv.read(spark, csv).count() == 4)
  }

  test("report aggregates match hand-computed values on the day filter") {
    val ev = Pipeline.extract(logLines.toDF("value"), 2025, Some(geo), None)
    val aggs = Pipeline.reportAggregates(ev, "03/03/2025")
    assert(aggs("total_today").collect().head.getLong(0) == 3)
    val top = aggs("top10_usernames").collect()
    assert(top.head.getAs[String]("user") == "root")
    assert(top.head.getAs[Long]("n") == 2)
    assert(aggs("rev_dns_failures").collect().head.getLong(0) == 3)
  }
}
