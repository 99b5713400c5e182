package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Syslog auth-failure parsing as pure column expressions — the Spark
  * rendering of the reference's two-regex parse stage
  * (`/root/reference/lib/maillogsentinel/log_utils.py:36-42,45-148`):
  * an anchored cheap prefix match first, the costlier SASL payload search
  * only on survivors, both fused into one WholeStageCodegen span by
  * Catalyst (the reference hand-sequences this; Catalyst gets it from
  * predicate ordering for free, SURVEY §4).
  *
  * Output schema (parity with the CSV header, parser.py:109-121):
  * server, date ("dd/MM/yyyy HH:mm", seconds truncated, year injected —
  * syslog lines carry none; the reference stamps wall-clock year,
  * parser.py:97), ip, user (trimmed, CR/LF → space).
  */
object LogParse {

  /** Anchored syslog prefix: month-abbrev, day, time, host
    * (log_utils.py:36-41). */
  val LogLineRe: String =
    "^([A-Z][a-z]{2}) +(\\d{1,2}) +(\\d{2}:\\d{2}:\\d{2}) +(\\S+) "

  /** SASL payload: first IPv4, then sasl_username up to the next comma
    * (log_utils.py:42). */
  val SaslRe: String =
    "(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}).*?sasl_username=([^,]+)"

  /** Month-abbreviation → zero-padded number (log_utils.py:21-34). */
  def monthNum(mon: Column): Column =
    Seq("Feb" -> "02", "Mar" -> "03", "Apr" -> "04", "May" -> "05",
      "Jun" -> "06", "Jul" -> "07", "Aug" -> "08", "Sep" -> "09",
      "Oct" -> "10", "Nov" -> "11", "Dec" -> "12")
      .foldLeft(when(mon === "Jan", "01")) { case (acc, (m, n)) =>
        acc.when(mon === m, n)
      }

  /** Dead-letter channel: the lines [[parse]] would drop, with a reason
    * tag — pipelines at scale route these to a quarantine table instead
    * of silently losing them (the reference logs-and-drops,
    * log_utils.py:136-148). Same single-pass expressions as parse; the
    * two outputs share the scan when both are consumed. */
  def rejects(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    val noPrefix = regexp_extract(c, LogLineRe, 1) === ""
    val noSasl = regexp_extract(c, SaslRe, 1) === "" ||
      regexp_extract(c, SaslRe, 2) === ""
    lines
      .filter(noPrefix || noSasl)
      .select(c.as("line"),
        when(noPrefix, "no_syslog_prefix")
          .otherwise("no_sasl_payload").as("reason"))
  }

  /** Parse a DataFrame of raw log lines (column `lineCol`) into the
    * 4-column core event frame; non-matching lines are dropped (the
    * reference returns None per bad line, log_utils.py:136-148 — here a
    * null month / empty extract fails the filter, so malformed input can
    * never throw). */
  def parse(lines: DataFrame, year: Int, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    val parsed = lines.select(
      regexp_extract(c, LogLineRe, 1).as("mon"),
      regexp_extract(c, LogLineRe, 2).as("day"),
      regexp_extract(c, LogLineRe, 3).as("time"),
      regexp_extract(c, LogLineRe, 4).as("server"),
      regexp_extract(c, SaslRe, 1).as("ip"),
      regexp_extract(c, SaslRe, 2).as("rawuser"))
    parsed
      .filter(col("mon") =!= "" && col("ip") =!= "" && col("rawuser") =!= "")
      .select(
        col("server"),
        concat(
          lpad(col("day"), 2, "0"), lit("/"),
          monthNum(col("mon")), lit(s"/$year "),
          substring(col("time"), 1, 5)).as("date"),
        col("ip"),
        // strip + CR/LF → space (log_utils.py:100-101)
        regexp_replace(trim(col("rawuser")), "[\\r\\n]", " ").as("user"))
      .filter(col("date").isNotNull)
  }
}
