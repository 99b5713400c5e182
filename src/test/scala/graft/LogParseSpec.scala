package graft

import org.apache.spark.sql.functions._

import graft.operators.LogParse

/** Parser unit tests in the style of the reference's golden-line suite
  * (test_log_utils.py:40-80) — fixtures synthesized here, not copied. */
class LogParseSpec extends SparkSpec {
  import spark.implicits._

  private val goodLine =
    "Jul  5 09:15:42 mailhost postfix/smtpd[2210]: warning: " +
      "unknown[203.0.113.7]: SASL LOGIN authentication failed, " +
      "sasl_username=alice@example.com, terminated"
  private val noSasl =
    "Jul  5 09:15:43 mailhost postfix/qmgr[990]: A1B2C3: removed"
  private val garbage = "%%% not a syslog line at all %%%"

  test("golden line parses cell-exact") {
    val out = LogParse.parse(Seq(goodLine).toDF("value"), 2025).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("server") == "mailhost")
    assert(r.getAs[String]("date") == "05/07/2025 09:15")
    assert(r.getAs[String]("ip") == "203.0.113.7")
    assert(r.getAs[String]("user") == "alice@example.com")
  }

  test("non-SASL and garbage lines are dropped, never throw") {
    val out = LogParse.parse(Seq(goodLine, noSasl, garbage, "").toDF("value"), 2025)
    assert(out.count() == 1)
  }

  test("single-digit day is zero-padded; seconds truncated") {
    val l = "Jan  3 23:59:59 h x[1.2.3.4]: SASL sasl_username=bob,"
    val r = LogParse.parse(Seq(l).toDF("value"), 2024).collect().head
    assert(r.getAs[String]("date") == "03/01/2024 23:59")
  }

  test("user CR/LF scrubbed and trimmed") {
    val l = "Feb 10 01:02:03 h x[9.8.7.6]: SASL sasl_username=  a\rb\nc  ,"
    val r = LogParse.parse(Seq(l).toDF("value"), 2024).collect().head
    assert(r.getAs[String]("user") == "a b c")
  }

  test("property: arbitrary lines never throw and never yield empty fields") {
    val rnd = new scala.util.Random(42)
    val fuzz = (1 to 300).map { _ =>
      val len = rnd.nextInt(120)
      new String((0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).toArray)
    }
    val rows = LogParse.parse(fuzz.toDF("value"), 2024).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("ip").nonEmpty)
      assert(r.getAs[String]("user").nonEmpty)
    }
  }

  test("all 12 month abbreviations map") {
    val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
      "Sep", "Oct", "Nov", "Dec")
    val df = months.toDF("m").select(LogParse.monthNum(col("m")).as("n"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("01", "02", "03", "04", "05", "06", "07", "08", "09", "10", "11", "12"))
  }
}
