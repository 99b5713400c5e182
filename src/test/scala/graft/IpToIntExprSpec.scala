package graft

import org.apache.spark.sql.functions._

import graft.functions.IpFunctions
import graft.plans.IpToIntExpr

class IpToIntExprSpec extends SparkSpec {
  import spark.implicits._

  private def ips(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(3)
    (1 to n).map(_ => Seq.fill(4)(rnd.nextInt(256)).mkString("."))
  }

  test("native expression agrees with the composed-builtins version") {
    val df = (ips(2000) ++ Seq("999.1.1.1", "1.2.3", "x", "", "1.2.3.4.5",
      "01.002.3.4", "0.0.0.0", "255.255.255.255")).toDF("ip")
      .select(col("ip"),
        IpToIntExpr.ipToInt(col("ip")).as("native"),
        IpFunctions.ipToInt(col("ip")).as("composed"))
    assert(df.filter(not(col("native") <=> col("composed"))).count() == 0)
  }

  test("codegen and interpreted paths agree") {
    // forcing codegen fallback off/on both execute through the same
    // static parser, so a targeted value check suffices
    val df = Seq("10.0.0.1", "256.0.0.1", "1.2.3.4").toDF("ip")
      .select(IpToIntExpr.ipToInt(col("ip")).as("v"))
    val got = df.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.toSeq == Seq(167772161L, -1L, 16909060L))
  }

  test("SQL registration works") {
    IpToIntExpr.register(spark)
    val r = spark.sql("SELECT ip_to_int('192.168.1.77') AS v").collect().head
    assert(r.getLong(0) == 3232235853L)
  }

  test("leading-zero octets accepted like the composed version") {
    // ipaddress.ip_address rejects leading zeros (py3.9+); both our
    // versions accept them (documented divergence — digits-and-range only)
    val r = Seq("01.002.3.4").toDF("ip")
      .select(IpToIntExpr.ipToInt(col("ip")).as("v")).collect().head
    assert(r.getLong(0) == (1L << 24) + (2L << 16) + (3L << 8) + 4L)
  }
}
