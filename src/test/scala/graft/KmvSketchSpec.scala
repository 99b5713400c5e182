package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvSketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def lk(k: Int) = new KmvSketch.LowestK(k)

  test("reduce keeps the k smallest distinct values, sorted") {
    val a = lk(4)
    val b = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 5L)
      .foldLeft(a.zero)(a.reduce)
    assert(b.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("reduce below capacity is exact and deduplicated") {
    val a = lk(10)
    val b = Seq(4L, 4L, 2L, 2L, 9L).foldLeft(a.zero)(a.reduce)
    assert(b.toSeq == Seq(2L, 4L, 9L))
  }

  test("merge equals the sketch of the union (lossless composition)") {
    val a = lk(5)
    val xs = Seq(10L, 40L, 20L, 80L, 60L, 30L)
    val ys = Seq(15L, 40L, 5L, 90L, 25L)
    val direct = (xs ++ ys).foldLeft(a.zero)(a.reduce)
    val merged = a.merge(
      xs.foldLeft(a.zero)(a.reduce), ys.foldLeft(a.zero)(a.reduce))
    assert(merged.toSeq == direct.toSeq)
    assert(merged.toSeq == Seq(5L, 10L, 15L, 20L, 25L))
  }

  test("sketch is partitioning-independent through a Spark aggregation") {
    val df = spark.range(0, 2000)
      .select(KmvSketch.hash32(col("id")).as("h"))
    val one = df.coalesce(1)
      .agg(KmvSketch.lowestK(col("h"), 64)).as[Array[Long]].head()
    val many = df.repartition(7)
      .agg(KmvSketch.lowestK(col("h"), 64)).as[Array[Long]].head()
    assert(one.toSeq == many.toSeq)
    assert(one.length == 64 && one.toSeq == one.toSeq.sorted)
  }

  test("estimateNdv: exact below k, within 25% above k") {
    // below k: 40 distinct values, k=64 -> the sketch IS the set
    val small = spark.range(0, 40)
      .select(KmvSketch.hash32(col("id")).as("h"))
      .agg(KmvSketch.lowestK(col("h"), 64).as("kmv"))
      .select(KmvSketch.estimateNdv("kmv", 64)).as[Long].head()
    assert(small == 40L)
    // above k: 5000 distinct, estimator within standard KMV error
    val big = spark.range(0, 5000)
      .select(KmvSketch.hash32(col("id")).as("h"))
      .agg(KmvSketch.lowestK(col("h"), 64).as("kmv"))
      .select(KmvSketch.estimateNdv("kmv", 64)).as[Long].head()
    assert(big > 3750 && big < 6250, s"estimate $big for true 5000")
  }

  test("buffer is bounded at k longs regardless of input size") {
    val sk = spark.range(0, 100000)
      .select(KmvSketch.hash32(col("id")).as("h"))
      .agg(KmvSketch.lowestK(col("h"), 32).as("kmv"))
      .as[Array[Long]].head()
    assert(sk.length == 32)
  }
}
