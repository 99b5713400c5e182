package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Misra–Gries heavy hitters (q65's kernel): exactness without
  * eviction, the classic guarantees with it. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(tokens: Seq[String], capacity: Int,
                       parts: Int = 4): Map[String, Long] =
    tokens.toDF("tok").repartition(parts)
      .agg(HeavyHitters.sketch(col("tok"), capacity).as("sk"))
      .collect().head.getAs[Map[String, Long]]("sk")

  test("capacity >= distinct items: sketch equals exact counts") {
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(5000)(s"t${rnd.nextInt(40)}")
    val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sketchOf(toks, capacity = 64) == exact)
  }

  test("under eviction: frequent items present, estimates in the MG band") {
    // 10k tokens: one 40% heavy hitter, one 20%, the rest spread thin
    val rnd = new scala.util.Random(11)
    val toks = Seq.fill(10000) {
      val r = rnd.nextInt(100)
      if (r < 40) "heavy" else if (r < 60) "warm" else s"cold${rnd.nextInt(500)}"
    }
    val n = toks.size.toLong
    val capacity = 16
    val exact = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = sketchOf(toks, capacity)
    val bound = n / (capacity + 1)
    // anything truly above n/(cap+1) must be present
    exact.filter(_._2 > bound).keys.foreach(k => assert(sk.contains(k), k))
    // no overcount; undercount bounded
    sk.foreach { case (k, est) =>
      val t = exact(k)
      assert(est <= t, s"$k overcounted: $est > $t")
      assert(t - est <= bound, s"$k undercount ${t - est} > $bound")
    }
    assert(sk.size <= capacity)
  }

  test("nulls are ignored") {
    val sk = Seq("a", null, "a", null, "b").toDF("tok")
      .agg(HeavyHitters.sketch(col("tok"), 8).as("sk"))
      .collect().head.getAs[Map[String, Long]]("sk")
    assert(sk == Map("a" -> 2L, "b" -> 1L))
  }
}
