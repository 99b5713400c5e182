package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout (q70's kernel): bit-interleave correctness, bucketize
  * monotonicity, and the actual file-skipping win — per-file min/max
  * spread on BOTH original columns is much tighter than arrival order.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey interleaves bits MSB-first across columns (col 0 highest)") {
    // bits=1: key = (x&1)<<1 | (y&1)
    val got = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), bits = 1).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
    // bits=2, x=2(10b), y=1(01b): positions x1->3, y1->2, x0->1, y0->0
    // x: bit1=1 -> pos 3; y: bit0=1 -> pos 0 => 1001b = 9
    val one = Seq((2L, 1L)).toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(one == 9L)
  }

  test("zkey of equal coordinates is the diagonal (locality sanity)") {
    // z(k,k) for bits=4 doubles every bit: 0,3,12,15,... all divisible by 3
    val got = (0L to 15L).map(k => (k, k)).toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].collect()
    got.foreach(z => assert(z % 3 == 0))
    assert(got.toSeq == got.toSeq.sorted) // monotone along the diagonal
  }

  test("bucketize maps values monotonically onto 0..2^bits-1") {
    val df = (1 to 4096).map(_.toDouble).toDF("v")
    val bounds = ZOrder.bucketBoundaries(df, "v", bits = 3, relErr = 0.0)
    assert(bounds.length == 7 && bounds.toSeq == bounds.sorted.toSeq)
    val buckets = df.select(col("v"),
        ZOrder.bucketize(col("v"), bounds).as("b"))
      .orderBy(col("v")).as[(Double, Long)].collect()
    assert(buckets.head._2 == 0L && buckets.last._2 == 7L)
    // non-decreasing in v, all 8 buckets hit, roughly even occupancy
    assert(buckets.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    val sizes = buckets.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size == 8 && sizes.values.forall(n => n > 256 && n < 768))
  }

  test("z-ordered files are min/max-prunable on both columns; arrival order is not") {
    // two independent uniform columns: arrival order correlates with
    // neither, so every file spans ~the full range of both
    val rnd = new scala.util.Random(5)
    val rows = (1 to 40000).map { i =>
      (i.toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)
    }
    val df = rows.toDF("seq", "x", "y")
    val dir = Files.createTempDirectory("zorder").toString

    ZOrder.writeZOrdered(df, Seq("x", "y"), bits = 8, numFiles = 16,
      s"$dir/z")
    df.repartitionByRange(16, col("seq")).sortWithinPartitions(col("seq"))
      .write.mode("overwrite").parquet(s"$dir/arrival")

    def meanSpread(path: String, c: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("spread"))
        .select(avg(col("spread"))).as[Double].head()
      perFile
    }
    // per-column: ideal for 16 files over a 2x8-bit key is ~4x (each
    // file covers one 64x64 Z-quadrant), but a file straddling a
    // sampled range boundary spans two adjacent Z-cells — which half
    // the time differ in the y cell — so assert a conservative 2x per
    // column and a 5x reduction of the min/max AREA (the quantity that
    // actually drives two-predicate file skipping)
    var area = 1.0
    var areaArrival = 1.0
    for (c <- Seq("x", "y")) {
      val z = meanSpread(s"$dir/z", c)
      val a = meanSpread(s"$dir/arrival", c)
      area *= z; areaArrival *= a
      assert(z * 2 <= a,
        s"col $c: z-order spread $z not 2x tighter than arrival $a")
    }
    assert(area * 5 <= areaArrival,
      s"min/max area $area not 5x tighter than arrival $areaArrival")
  }
}
