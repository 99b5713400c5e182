package graft

import org.apache.spark.sql.DataFrame

/** Driver-side text rendering of the daily report — the presentation
  * layer of `/root/reference/lib/maillogsentinel/report.py:286-418`,
  * reproducing the layout of the golden output
  * (`docs/dataset/sample_email_report_output.txt`): a boxed header, five
  * aligned top-10 blocks, the reverse-DNS breakdown, and footer totals.
  *
  * Everything here runs on collect()ed aggregate rows (tens of rows);
  * all heavy lifting happened in Pipeline.reportAggregates. Email
  * delivery is a thin SMTP call the caller owns — out of engine scope.
  */
object ReportFormat {

  private def pad(s: String, w: Int): String =
    if (s.length >= w) s else s + (" " * (w - s.length))

  private def lpad(s: String, w: Int): String =
    if (s.length >= w) s else (" " * (w - s.length)) + s

  /** One aligned count block: title, rows of "label.. count". */
  def block(title: String, rows: Seq[(Seq[String], Long)]): String = {
    if (rows.isEmpty) return s"$title\n  (none)\n"
    val labelW = rows.map(_._1.mkString("  ").length).max
    val countW = rows.map(_._2.toString.length).max
    val lines = rows.map { case (labels, n) =>
      s"  ${pad(labels.mkString("  "), labelW)}  ${lpad(n.toString, countW)}"
    }
    s"$title\n${lines.mkString("\n")}\n"
  }

  private def rowsOf(df: DataFrame, keyCols: Seq[String],
                     countCol: String = "n"): Seq[(Seq[String], Long)] =
    df.collect().toSeq.map { r =>
      (keyCols.map(c => Option(r.getAs[Any](c)).fold("null")(_.toString)),
        r.getAs[Long](countCol))
    }

  /** Full report text from Pipeline.reportAggregates output. */
  def render(aggs: Map[String, DataFrame], server: String,
             today: String): String = {
    val total = aggs("total_today").collect().head.getLong(0)
    val dnsFail = aggs("rev_dns_failures").collect().head.getLong(0)
    val header = Seq(
      "#" * 60,
      s"#  MailLogSentinel-Spark daily report",
      s"#  server: $server   date: $today",
      s"#  authentication failures today: $total",
      "#" * 60).mkString("\n")
    val blocks = Seq(
      block("Top 10 failed authentications (user, ip, host, country):",
        rowsOf(aggs("top10_today"),
          Seq("user", "ip", "hostname", "country_code"))),
      block("Top 10 usernames:", rowsOf(aggs("top10_usernames"), Seq("user"))),
      block("Top 10 countries:",
        rowsOf(aggs("top10_countries"), Seq("country_code"))),
      block("Top 10 AS organizations:", rowsOf(aggs("top10_aso"), Seq("aso"))),
      block("Top 10 ASNs:", rowsOf(aggs("top10_asn"), Seq("asn"))),
      block(s"Reverse-DNS failures today: $dnsFail — breakdown:",
        rowsOf(aggs("rev_dns_breakdown"), Seq("reverse_dns_status"))))
    (header +: blocks).mkString("\n\n") + "\n"
  }
}
