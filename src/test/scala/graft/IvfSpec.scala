package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class IvfSpec extends SparkSpec {

  private lazy val vectors = {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    e.select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))
  }

  test("every vector lands in exactly one cell") {
    val cents = Similarity.ivfCentroidsByStride(vectors, 32)
    val idx = Similarity.ivfAssign(vectors, cents)
    assert(idx.count() == vectors.count())
    assert(idx.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)
    // cells are reasonably populated (no empty index)
    assert(idx.select(countDistinct(col("cid"))).collect().head.getLong(0) > 1)
  }

  test("k-means training reduces inertia over the stride init") {
    val init = Similarity.ivfCentroidsByStride(vectors, 32)
    val i0 = Similarity.inertia(vectors, init)
    val trained = Similarity.kmeansCentroids(vectors, init, iters = 3)
    val i3 = Similarity.inertia(vectors, trained)
    assert(i3 < i0, s"inertia should drop: $i0 -> $i3")
    // centroid count preserved (empty cells keep previous centroid)
    assert(trained.count() == init.count())
  }

  test("IVF search recall vs brute force improves with nprobe") {
    val cents = Similarity.ivfCentroidsByStride(vectors, 32)
    val idx = Similarity.ivfAssign(vectors, cents).cache()
    val queries = vectors.filter(col("id") < 8)
    val exact = Similarity.cosineTopK(vectors, queries, 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfSearch(idx, cents, queries, nprobe, 5)
        .select(col("q_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val rAll = recall(100) // probing all cells == exhaustive
    assert(rAll == 1.0, s"full probe must be exact, got $rAll")
    assert(r2 > 0.0)
    assert(rAll >= r2)

    // the annRecall eval operator reads the same numbers off the frames
    val exactDf = Similarity.cosineTopK(vectors, queries, 5)
      .select(col("q_id"), col("vec_id"))
    val candDf = Similarity.ivfSearch(idx, cents, queries, 2, 5)
      .select(col("q_id"), col("vec_id"))
    val evalMean = Similarity.annRecall(exactDf, candDf, 5)
      .agg(avg(col("recall_permille"))).head.getDouble(0)
    assert(math.abs(evalMean / 1000.0 - r2) < 0.11,
      s"annRecall mean $evalMean vs manual $r2 (permille granularity)")
    idx.unpersist()
  }
}
