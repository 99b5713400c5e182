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

  test("hilbert key: exhaustive 16x16 — bijective AND consecutive keys grid-adjacent") {
    import spark.implicits._
    val grid = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val keyed = ZOrder.withHilbert(grid, "x", "y", bits = 4, outCol = "d")
      .select("x", "y", "d")
      .as[(Long, Long, Long)].collect()
    // bijection onto [0, 256)
    assert(keyed.map(_._3).sorted.toSeq == (0L until 256L))
    // THE Hilbert property (Z-order lacks it): walking the curve in
    // key order moves exactly one grid step at a time
    val walk = keyed.sortBy(_._3)
    walk.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, d2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump before d=$d2: ($x1,$y1)->($x2,$y2)")
    }
    // first cell is the origin, per the standard orientation
    assert(walk.head == ((0L, 0L, 0L)))
  }

  test("hilbert: bits=1 base case matches the canonical U") {
    import spark.implicits._
    val g = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val got = ZOrder.withHilbert(g, "x", "y", 1, "d")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("hilbert files cover connected regions: per-file bbox area beats z-order") {
    // 2x8-bit grid, 16 range files each: a Hilbert segment is one
    // connected region while a Z segment straddles quadrant seams, so
    // the summed per-file bounding-box AREA must not be worse
    import spark.implicits._
    val n = 1 << 16
    val pts = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(256L)).as("x"),
      pmod(col("id") * 40503L, lit(256L)).as("y"))
    def meanArea(df: org.apache.spark.sql.DataFrame, key: String): Double =
      df.repartitionByRange(16, col(key))
        .select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
          .as("area"))
        .agg(avg("area")).as[Double].head()
    val hil = meanArea(
      ZOrder.withHilbert(pts, "x", "y", 8, "hd"), "hd")
    val zor = meanArea(
      pts.withColumn("zk", ZOrder.zkey(Seq(col("x"), col("y")), 8)), "zk")
    assert(hil <= zor * 1.05, s"hilbert bbox area $hil vs z-order $zor")
  }
}
