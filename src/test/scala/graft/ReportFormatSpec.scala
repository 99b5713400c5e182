package graft

class ReportFormatSpec extends SparkSpec {
  import spark.implicits._

  test("render produces the boxed header + aligned blocks layout") {
    val logLines = Seq(
      "Mar  3 08:00:01 mx1 p[1]: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Mar  3 08:00:02 mx1 p[1]: unknown[10.0.0.5]: SASL LOGIN authentication failed, sasl_username=root",
      "Mar  3 08:01:00 mx1 p[2]: unknown[172.16.0.9]: SASL PLAIN authentication failed, sasl_username=admin")
    val ev = Pipeline.extract(logLines.toDF("value"), 2025)
    val txt = ReportFormat.render(
      Pipeline.reportAggregates(ev, "03/03/2025"), "mx1", "03/03/2025")
    assert(txt.contains("authentication failures today: 3"))
    assert(txt.contains("Top 10 usernames:"))
    // alignment: label column padded to the widest label
    val userLines = txt.linesIterator
      .dropWhile(!_.startsWith("Top 10 usernames")).drop(1).take(2).toSeq
    assert(userLines.head.matches("  root   2"))
    assert(userLines(1).matches("  admin  1"))
    assert(txt.contains("Reverse-DNS failures today: 3"))
  }

  test("empty day renders (none) blocks, not exceptions") {
    val ev = Pipeline.extract(Seq.empty[String].toDF("value"), 2025)
    val txt = ReportFormat.render(
      Pipeline.reportAggregates(ev, "01/01/2030"), "mx", "01/01/2030")
    assert(txt.contains("authentication failures today: 0"))
    assert(txt.contains("(none)"))
  }
}
