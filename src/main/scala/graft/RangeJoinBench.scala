package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.plans.RangeLookup

/** Head-to-head of the three range-join strategies at real GeoIP scale
  * (~300k non-overlapping ranges, like sapics/ip-location-db) so the
  * choice in Enrich.withGeo is measured, not guessed:
  *
  *   theta    — BroadcastNestedLoopJoin, O(|dim|) per probe row
  *   bucketed — explode dim to /16 buckets, broadcast hash join, ~O(1)
  *   custom   — RangeLookupExec broadcast binary search, O(log n)
  *
  *   sbt "runMain graft.RangeJoinBench [nRanges] [nProbes]"
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val nRanges = if (args.length > 0) args(0).toInt else 300000
    val nProbes = if (args.length > 1) args(1).toInt else 2000000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // non-overlapping ranges with ~20% gap coverage
    val width = (1L << 32) / nRanges
    val dim = spark.range(nRanges).select(
      (col("id") * width).as("lo"),
      (col("id") * width + (width * 4) / 5).as("hi"),
      concat(lit("cc"), pmod(col("id"), lit(250))).as("tag"))
      .cache()
    dim.count()
    val probes = spark.range(nProbes).select(
      pmod(col("id") * 2654435761L, lit(1L << 32)).as("k")).cache()
    probes.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[range-bench] $name%-10s $n%10d hits  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("custom") {
      RangeLookup.join(probes, dim, "k", "lo", "hi")
        .filter(col("tag").isNotNull).count()
    }
    time("bucketed") {
      RangeJoin.bucketed(probes, dim, "k", "lo", "hi", shift = 16)
        .filter(col("tag").isNotNull).count()
    }
    if (nRanges <= 50000) time("theta") { // BNLJ is O(n^2)-ish: cap the size
      RangeJoin.broadcastTheta(probes, dim, col("k"), col("lo"), col("hi"))
        .filter(col("tag").isNotNull).count()
    } else println("[range-bench] theta      skipped (O(n*m) at this size)")

    spark.stop()
  }
}
