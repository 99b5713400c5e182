package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity
import graft.streaming.StreamingAnn

class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 4

  private def vectors(seed: Int, n: Int, dims: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      i.toLong -> Seq.fill(dims)(rnd.nextDouble() * 2 - 1))
  }

  private def canonical(pairs: Seq[(Long, Long)]): Set[(Long, Long)] =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

  /** Batch reference: every vector queries the whole corpus. */
  private def batchPairs(vecs: Seq[(Long, Seq[Double])]): Set[(Long, Long)] = {
    val df = vecs.toDF("id", "v")
    canonical(Similarity.multiProbeCandidates(df, df, bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  /** Stream in `nBatches` slices, restarting the query per slice (the
    * checkpoint carries bucket state across restarts). */
  private def streamedPairs(vecs: Seq[(Long, Seq[Double])],
                            nBatches: Int): Set[(Long, Long)] = {
    val d = Files.createTempDirectory("graft-sann")
    val in = d.resolve("in").toString
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    val slices = vecs.grouped(
      math.max(1, (vecs.size + nBatches - 1) / nBatches)).toSeq
    slices.foreach { slice =>
      slice.toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(in)
      val stream = spark.readStream
        .schema("id LONG, v ARRAY<DOUBLE>")
        .parquet(in)
      val q = StreamingAnn.candidates(stream, bits)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    canonical(spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("streamed candidate set equals batch multi-probe for any slicing") {
    val vecs = vectors(seed = 11, n = 60, dims = 8)
    val want = batchPairs(vecs)
    assert(want.nonEmpty, "fixture should produce candidate pairs")
    assert(streamedPairs(vecs, nBatches = 1) == want)
    assert(streamedPairs(vecs, nBatches = 5) == want,
      "slicing (with per-slice query restarts) must not change the set")
  }

  test("re-delivered vectors neither duplicate state nor emissions") {
    // v0/v1 share a bucket (identical signs); v0 is delivered TWICE
    // across slices (at-least-once source). v1's later arrival must
    // pair with v0 exactly once per probe hit, not once per delivery.
    val v0 = 0L -> Seq(0.5, 0.5, 0.5, 0.5, 0.1, 0.1, 0.1, 0.1)
    val v1 = 1L -> Seq(0.4, 0.6, 0.5, 0.5, 0.2, 0.1, 0.1, 0.1)
    val d = Files.createTempDirectory("graft-sann-redeliver")
    val in = d.resolve("in").toString
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString
    Seq(Seq(v0), Seq(v0), Seq(v1)).foreach { slice =>
      slice.toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
      val q = StreamingAnn.candidates(
          spark.readStream.schema("id LONG, v ARRAY<DOUBLE>").parquet(in),
          bits)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val raw = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // v1 probes bits+1 buckets but only ONE contains v0 (same bucket);
    // had the re-delivery re-added v0 to state, this would be 2 rows
    assert(raw.count(_ == (1L, 0L)) == 1,
      s"duplicate emission from re-delivered resident: $raw")
  }

  test("no self pairs; every pair is within Hamming distance 1") {
    val vecs = vectors(seed = 23, n = 40, dims = 8)
    val byId = vecs.toMap
    def bucket(v: Seq[Double]): Long =
      (0 until bits).map(i => if (v(i) >= 0) 1L << i else 0L).sum
    val got = streamedPairs(vecs, nBatches = 3)
    assert(got.forall { case (a, b) => a != b })
    assert(got.forall { case (a, b) =>
      java.lang.Long.bitCount(bucket(byId(a)) ^ bucket(byId(b))) <= 1
    })
  }
}
