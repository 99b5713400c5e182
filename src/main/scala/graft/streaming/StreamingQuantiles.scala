package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.QuantileSketch

/** Streaming quantiles — p50/p99 over an unbounded stream via the
  * MERGEABILITY of the t-digest, the same batch-sketch-per-microbatch
  * design as [[StreamingHeavyHitters]]:
  *
  *  - each micro-batch aggregates its own distributed t-digest
  *    (bounded centroid buffers are all that cross the exchange);
  *  - foreachBatch writes that batch's compressed centroids (≤ c+1
  *    tiny rows) to `dir/batch=<id>`, overwriting its OWN directory —
  *    idempotent under batch replay, exactly-once without transactions;
  *  - the global summary at any time = merge+compress of all committed
  *    batch sketches. In the exact regime (compression ≥ 2·total n)
  *    the summary equals the sorted-multiset quantiles NO MATTER how
  *    the stream was sliced into batches; in the approximate regime
  *    the rank error stays O(q(1−q)/c) as every t-digest merge does.
  *
  * 100 TB posture: per-batch cost is the batch's own aggregation; the
  * summary read touches |batches| × (c+1) rows — metadata scale.
  * Compaction = merge old batch sketches into one, same operation. */
object StreamingQuantiles {

  /** Start the sketch-maintaining query. */
  def run(values: DataFrame, valueCol: String, compression: Int,
          dir: String, checkpoint: String,
          configure: org.apache.spark.sql.streaming.DataStreamWriter[Row] =>
            org.apache.spark.sql.streaming.DataStreamWriter[Row] = identity)
      : StreamingQuery = {
    val w = values.select(col(valueCol).cast("double").as("v"))
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val spark = df.sparkSession
        val cents = df.agg(QuantileSketch.sketch(col("v"), compression).as("sk"))
          .collect().head.getSeq[Row](0)
          .map(r => (r.getDouble(0), r.getLong(1)))
        import spark.implicits._
        cents.toDF("mean", "weight")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
    configure(w).start()
  }

  /** Merge every committed batch sketch into one compressed digest. */
  def mergedCentroids(spark: SparkSession, dir: String,
                      compression: Int): QuantileSketch.Centroids = {
    val sketches = spark.read.parquet(dir)
      .select(col("mean"), col("weight"), col("batch"))
      .collect()
      .groupBy(_.getAs[Number]("batch").longValue)
      .toSeq.sortBy(_._1)
      .map(_._2.map(r =>
        (r.getAs[Double]("mean"), r.getAs[Long]("weight"))).toVector)
    QuantileSketch.mergeSketches(sketches, compression)
  }

  /** Global quantiles: merge every committed batch sketch. */
  def summary(spark: SparkSession, dir: String, qs: Seq[Double],
              compression: Int): Seq[Double] =
    QuantileSketch.quantilesOf(mergedCentroids(spark, dir, compression), qs)

  /** Refresh the StatsCatalog equi-depth histogram for (table, column)
    * from the sketch directory — the STREAMING leg of the stats
    * pipeline: the stream maintains bounded mergeable sketches per
    * batch, this refresh is a metadata-sized batch job over them (no
    * data rescan), and a planner reads the result via
    * `StatsCatalog.histogramBounds`. In the sketch's exact regime the
    * boundaries equal the exact sorted ranks (q76's contract) and the
    * per-bucket counts are exact; in the approximate regime both carry
    * the documented O(q(1−q)/c) rank error. Buckets with no centroids
    * are absent, matching q76's shape. */
  def refreshCatalogHistogram(spark: SparkSession, sketchDir: String,
                              catalogDir: String, table: String,
                              column: String, nBuckets: Int,
                              compression: Int): Unit = {
    require(nBuckets >= 2)
    val merged = mergedCentroids(spark, sketchDir, compression)
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds = QuantileSketch.quantilesOf(merged, qs).toArray
    def bucketOf(m: Double): Int = {
      val i = bounds.indexWhere(m <= _)
      if (i < 0) nBuckets - 1 else i
    }
    val rows = merged.groupBy { case (m, _) => bucketOf(m) }
      .toSeq.sortBy(_._1)
      .map { case (b, cs) =>
        (b, cs.map(_._2).sum, cs.map(_._1).min, cs.map(_._1).max)
      }
    import spark.implicits._
    graft.operators.StatsCatalog.writeHistogram(catalogDir, table, column,
      rows.toDF("bucket", "n", "vmin", "vmax"))
  }
}
