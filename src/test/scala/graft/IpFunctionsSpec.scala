package graft

import org.apache.spark.sql.functions._

import graft.functions.IpFunctions

class IpFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("known conversions") {
    val df = Seq("0.0.0.0", "255.255.255.255", "10.0.0.1", "192.168.1.77")
      .toDF("ip")
      .select(IpFunctions.ipToInt(col("ip")).as("v"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 4294967295L, 167772161L, 3232235853L))
  }

  test("invalid shapes yield null") {
    val bad = Seq("1.2.3", "1.2.3.4.5", "256.1.1.1", "a.b.c.d", "", "1..2.3")
      .toDF("ip")
      .select(IpFunctions.ipToInt(col("ip")).as("v"))
    assert(bad.collect().forall(_.isNullAt(0)))
  }

  test("property: int -> ip -> int roundtrip") {
    val rnd = new scala.util.Random(7)
    val vals = (1 to 500).map(_ => rnd.nextLong() & 0xFFFFFFFFL)
    val df = vals.toDF("v")
      .select(col("v"),
        IpFunctions.ipToInt(IpFunctions.intToIp(col("v"))).as("rt"))
    assert(df.filter(col("v") =!= col("rt")).count() == 0)
  }
}
