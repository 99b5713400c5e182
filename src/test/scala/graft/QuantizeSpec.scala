package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 roundtrip error is bounded by half a bin step per dimension") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(8)(rnd.nextDouble() * 4 - 2))
    }.toDF("id", "v")
    val stats = Quantize.dimStats(vecs)
    val codes = Quantize.encode(vecs, stats)
    val err = codes.join(broadcast(stats), Seq("d"))
      .join(vecs.select(col("id"),
        posexplode(col("v")).as(Seq("d0", "x")))
        .select(col("id"), (col("d0") + 1).cast("long").as("d"), col("x")),
        Seq("id", "d"))
      .select(abs(col("x") -
        Quantize.dequantize(col("code"), col("mn"), col("mx"))).as("e"),
        ((col("mx") - col("mn")) / 255.0 / 2.0 + 1e-12).as("bound"))
    assert(err.filter(col("e") > col("bound")).count() == 0)
    // codes fill the 0..255 range at the observed dims' extremes
    val range = codes.agg(min(col("code")), max(col("code"))).collect().head
    assert(range.getLong(0) == 0L && range.getLong(1) == 255L)
  }

  test("constant dimension encodes as 0 and dequantizes to itself") {
    val vecs = Seq((1L, Array(3.5, 1.0)), (2L, Array(3.5, 2.0)))
      .toDF("id", "v")
    val stats = Quantize.dimStats(vecs)
    val codes = Quantize.encode(vecs, stats).filter(col("d") === 1)
      .select(col("code")).collect().map(_.getLong(0)).toSet
    assert(codes == Set(0L))
    val deq = stats.filter(col("d") === 1)
      .select(Quantize.dequantize(lit(0L), col("mn"), col("mx")))
      .collect().head.getDouble(0)
    assert(deq == 3.5)
  }
}
