package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.plans.RangeLookup

class RangeLookupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dim = Seq(
    (0L, 99L, "a"), (200L, 299L, "b"), (300L, 300L, "c"), (1000L, 4095L, "d"))
    .toDF("lo", "hi", "tag")
  private lazy val probes = {
    val rnd = new scala.util.Random(13)
    (1 to 3000).map(_ => rnd.nextInt(5000).toLong).toDF("k")
  }

  test("custom exec node appears in the physical plan") {
    val out = RangeLookup.join(probes, dim, "k", "lo", "hi")
    // sparkPlan, not executedPlan: before execution AQE shows only the
    // AdaptiveSparkPlan wrapper. nodeName strips the Exec suffix.
    assert(out.queryExecution.sparkPlan.toString.contains("RangeLookup "))
  }

  test("matches the broadcast theta join exactly, including misses") {
    val custom = RangeLookup.join(probes, dim, "k", "lo", "hi")
      .select(col("k"), col("tag"))
    val theta = RangeJoin
      .broadcastTheta(probes, dim, col("k"), col("lo"), col("hi"))
      .select(col("k"), col("tag"))
    assert(custom.exceptAll(theta).count() == 0)
    assert(theta.exceptAll(custom).count() == 0)
    // misses survive with null tags (left outer)
    assert(custom.filter(col("tag").isNull).count() ==
      theta.filter(col("tag").isNull).count())
  }

  test("downstream operations compose (filter + group on joined output)") {
    val out = RangeLookup.join(probes, dim, "k", "lo", "hi")
      .groupBy(coalesce(col("tag"), lit("miss")).as("tag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("tag"))
    val total = out.agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == 3000)
  }
}
