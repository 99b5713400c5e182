package graft

import org.apache.spark.sql.functions._
import graft.operators.{RandomProjection, Similarity}

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("driver-side signAt matches the DataFrame sign matrix") {
    val m = RandomProjection.signMatrix(spark, dims = 16, outDims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.size == 64)
    for (i <- 1 to 16; j <- 0 until 4)
      assert(m((i.toLong, j.toLong)) == RandomProjection.signAt(i, j),
        s"sign mismatch at ($i, $j)")
    // the matrix is genuinely mixed, not all-ones
    assert(m.values.toSet == Set(1L, -1L))
  }

  test("join-shaped and inline projections are identical on real embeddings") {
    val e = Tables.embeddings(spark, sf()).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("id") < 100)
    val signs = RandomProjection.signMatrix(spark, dims = 64, outDims = 8)
    val a = RandomProjection.projectFp(e, signs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = RandomProjection.projectFpInline(e, dims = 64, outDims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a.size == 800 && a == b)
  }

  test("projection of a known vector is the exact signed sum") {
    val v = Seq((0L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val got = RandomProjection.projectFpInline(v, dims = 3, outDims = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = (0 until 2).map { j =>
      j.toLong -> (1 to 3).map(i =>
        RandomProjection.signAt(i, j) * (Seq(1000000L, 2000000L, 3000000L))(i - 1)).sum
    }.toMap
    assert(got == want)
  }

  test("inline projection is streaming-legal: append-mode stream equals batch") {
    // the projection is a stateless map (no shuffle, no state), so it
    // runs in a plain append-mode stream — the property SCALE.md
    // claims for the 100 TB ingest path
    val d = java.nio.file.Files.createTempDirectory("graft-rp-stream")
    val in = d.resolve("in").toString
    val out = d.resolve("out").toString
    val vecs = Tables.embeddings(spark, sf()).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .filter(col("id") < 50)
    vecs.coalesce(1).write.parquet(in)
    val stream = spark.readStream
      .schema("id LONG, v ARRAY<DOUBLE>").parquet(in)
    val q = RandomProjection.projectFpInline(stream, dims = 64, outDims = 8)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = RandomProjection.projectFpInline(vecs, 64, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.size == 400 && streamed == batch)
  }

  test("inline projection plan is map-only: no shuffle before the census agg") {
    val e = Tables.embeddings(spark, sf()).select(
      col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val plan = RandomProjection.projectFpInline(e, dims = 64, outDims = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"inline projection should be shuffle-free, got:\n$plan")
  }
}
