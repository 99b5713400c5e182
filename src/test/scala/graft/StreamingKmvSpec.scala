package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.KmvSketch
import graft.streaming.StreamingKmv

/** Stream == batch for the KMV sketch: after any prefix of
  * micro-batches, the per-key state (fill, k-th min, estimate) equals
  * the batch sketch of everything arrived so far. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8

  private def expected(rows: Seq[(String, Long)]): Map[String, (Int, Long, Long)] =
    rows.groupBy(_._1).map { case (key, rs) =>
      val sk = rs.map(_._2).distinct.sorted.take(k)
      val fill = sk.length
      val kth = if (fill >= k) sk(k - 1) else -1L
      val est = if (fill < k) fill.toLong
        else (k - 1).toLong * KmvSketch.HashSpace / kth
      key -> ((fill, kth, est))
    }

  test("cross-batch sketch equals the batch sketch of the arrived prefix") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val out = StreamingKmv.sketches(
      ms.toDF().toDF("key", "h"), "key", "h", k)
    val q = out.writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    try {
      // batch 1: source a gets 6 distinct (< k), b gets 12 (> k, dups)
      val b1 = (1L to 6L).map(("a", _)) ++
        (101L to 112L).map(("b", _)) ++ Seq(("b", 105L), ("b", 101L))
      ms.addData(b1: _*)
      q.processAllAvailable()
      // batch 2: a crosses k with smaller values; b gains one new min
      val b2 = (7L to 20L).map(("a", _)) ++ Seq(("b", 50L), ("a", 3L))
      ms.addData(b2: _*)
      q.processAllAvailable()

      val rows = spark.sql("SELECT * FROM kmv_out")
        .as[(String, Int, Long, Long)].collect()
      // Update mode emits one row per touched key per batch; the
      // latest state has the max fill, ties broken by the smaller kth
      // (fill is nondecreasing, kth nonincreasing across batches)
      val latest = rows.groupBy(_._1).map { case (key, rs) =>
        val r = rs.maxBy(t => (t._2, -t._3))
        key -> ((r._2, r._3, r._4))
      }
      assert(latest == expected(b1 ++ b2))
    } finally q.stop()
  }

  test("single-batch stream equals the Spark batch aggregator") {
    implicit val sqlCtx = spark.sqlContext
    val data = (1L to 300L).map(i => ("s" + (i % 3), i * 37 % 101))
    val ms = MemoryStream[(String, Long)]
    val out = StreamingKmv.sketches(
      ms.toDF().toDF("key", "h"), "key", "h", k)
    val q = out.writeStream.format("memory").queryName("kmv_one")
      .outputMode("update").start()
    try {
      ms.addData(data: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT key, fill, kth FROM kmv_one")
        .as[(String, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      val batch = data.toDF("key", "h").groupBy(col("key"))
        .agg(KmvSketch.lowestK(col("h"), k).as("kmv"))
        .as[(String, Array[Long])].collect().map { case (key, sk) =>
          key -> ((sk.length, if (sk.length >= k) sk(k - 1) else -1L))
        }.toMap
      assert(got == batch)
    } finally q.stop()
  }
}
