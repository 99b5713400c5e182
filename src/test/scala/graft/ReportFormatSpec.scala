package graft

class ReportFormatSpec extends SparkSpec {
  import spark.implicits._

  private def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    assert(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private val fullStats = ReportFormat.Stats(
    totalToday = 55,
    top10Today = Seq(
      (("user@example.com", "111.222.11.22", "host.attacker.cn", Some("CN")), 5L),
      (("admin@example.com", "22.33.44.55", "another.host.ru", Some("RU")), 4L),
      (("testuser", "123.123.1.2", "unknown.host.br", Some("BR")), 3L),
      (("user.1@domain.tld", "220.182.17.122", "null", Some("N/A")), 1L)),
    top10Usernames = Seq(
      ("user@example.com", 10L), ("user.1@domain.tld", 6L), ("contact", 2L)),
    top10Countries = Seq(("CN", 6L), ("RU", 1L)),
    top10Aso = Seq(
      ("CHINA UNICOM China169 Backbone", 2L),
      ("PJSC Moscow city telephone network", 1L)),
    top10Asn = Seq(("4837", 2L), ("134810", 112L)),
    totalRevDnsFailures = 26,
    revDnsErrorCounts = Seq(("Errno 1", 24L), ("Errno 2", 2L)),
    csvSizeStr = "241.1K", csvLinesStr = "3613")

  test("byte-parity with the reference layout (golden, full report)") {
    val txt = ReportFormat.renderEmail(
      "MailLogSentinel", "v1.0.5-A", "hourly", "2025-05-28 10:30",
      "192.168.1.10", "mail.example.com", fullStats, "maillogsentinel.csv")
    assert(txt == golden("golden_report_full.txt"))
  }

  test("byte-parity with the reference layout (golden, empty day)") {
    val empty = ReportFormat.Stats(0, Nil, Nil, Nil, Nil, Nil, 0, Nil,
      "0.0K", "0")
    val txt = ReportFormat.renderEmail(
      "MailLogSentinel", "v1.0.5-A", "daily", "2030-01-01 00:00",
      "10.0.0.1", "mx.test", empty, "maillogsentinel.csv")
    assert(txt == golden("golden_report_empty.txt"))
  }

  test("subject and size formatting match the reference") {
    assert(ReportFormat.subject("[Sentinel]", "MailLogSentinel", "mx.test")
      == "[Sentinel] MailLogSentinel report on mx.test")
    assert(ReportFormat.sizeK(246886) == "241.1K")
  }

  test("pipeline aggregates render end-to-end through the adapter") {
    val logLines = Seq(
      "Mar  3 08:00:01 mx1 p[1]: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Mar  3 08:00:02 mx1 p[1]: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Mar  3 08:01:00 mx1 p[2]: unknown[172.16.0.9]: SASL PLAIN authentication failed, sasl_username=admin")
    val ev = Pipeline.extract(logLines.toDF("value"), 2025)
    val txt = ReportFormat.render(
      Pipeline.reportAggregates(ev, "03/03/2025"), "mx1", "03/03/2025")
    assert(txt.contains("Total attempts today: 3"))
    // alignment: username column padded to the reference minimum of 4,
    // counts right-justified to width 5
    assert(txt.contains("   1. root       2 times"))
    assert(txt.contains("   2. admin      1 times"))
    // rDNS disabled in this pipeline => all lookups failed
    assert(txt.contains("Total failed reverse lookups today: 3"))
    assert(txt.contains("Breakdown by error type:"))
  }

  test("extractionFrequency reads OnCalendar, defaults to hourly") {
    val dir = java.nio.file.Files.createTempDirectory("timer")
    val unit = dir.resolve("maillogsentinel-extract.timer")
    java.nio.file.Files.writeString(unit,
      "[Unit]\nDescription=x\n\n[Timer]\n  OnCalendar=*-*-* 03:00:00\n")
    assert(ReportFormat.extractionFrequency(unit) == "*-*-* 03:00:00")
    java.nio.file.Files.writeString(unit, "[Timer]\nPersistent=true\n")
    assert(ReportFormat.extractionFrequency(unit) == "hourly")
    assert(ReportFormat.extractionFrequency(
      dir.resolve("missing.timer")) == "hourly")
  }

  test("empty day renders the reference's else-branch messages") {
    val ev = Pipeline.extract(Seq.empty[String].toDF("value"), 2025)
    val txt = ReportFormat.render(
      Pipeline.reportAggregates(ev, "01/01/2030"), "mx", "01/01/2030")
    assert(txt.contains("Total attempts today: 0"))
    assert(txt.contains("  (no entries for today)"))
    assert(txt.contains("  (no specific username stats for today)"))
    assert(txt.contains("  (no countries stats for today)"))
  }
}
