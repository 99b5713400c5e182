package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.HeavyHitters

/** Streaming heavy hitters — Misra–Gries over an unbounded stream using
  * the MERGEABILITY of the sketch instead of stream state:
  *
  *  - each micro-batch computes its own distributed MG sketch (the
  *    batch Aggregator — capacity-bounded maps are all that cross the
  *    batch's exchange);
  *  - foreachBatch writes that batch's sketch (≤ capacity tiny rows)
  *    to `dir/batch=<id>` — overwriting ITS OWN directory, so a batch
  *    replay after a crash is idempotent (the BatchSink pattern:
  *    batch-id-keyed artifacts give exactly-once without transactions);
  *  - the global summary at any time = fold-merge of all committed
  *    batch sketches, which the mergeable-summaries bound guarantees
  *    stays within n/(capacity+1) of truth no matter how the stream
  *    was sliced into batches.
  *
  * 100 TB posture: per-batch cost is the batch's own aggregation; the
  * summary read touches |batches| × capacity rows — metadata scale, not
  * data scale. Compaction (merging old batch sketches into one) is the
  * same merge and can run any time. */
object StreamingHeavyHitters {

  /** Start the sketch-maintaining query (AvailableNow/continuous per
    * the caller's trigger via `configure`). */
  def run(items: DataFrame, itemCol: String, capacity: Int,
          dir: String, checkpoint: String,
          configure: org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] => org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] = identity): StreamingQuery = {
    val w = items.select(col(itemCol).cast("string").as("item"))
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val spark = df.sparkSession
        val sk = df.agg(HeavyHitters.sketch(col("item"), capacity).as("sk"))
          .collect().head.getAs[Map[String, Long]]("sk")
        import spark.implicits._
        sk.toSeq.toDF("item", "est")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
    configure(w).start()
  }

  /** Global summary: fold-merge of every committed batch sketch. */
  def summary(spark: SparkSession, dir: String,
              capacity: Int): Map[String, Long] = {
    val mg = new HeavyHitters.MisraGries(capacity)
    val perBatch = spark.read.parquet(dir)
      .collect()
      .groupBy(_.getAs[Number]("batch").longValue) // partition col infers int
      .toSeq.sortBy(_._1)
      .map(_._2.map(r =>
        r.getAs[String]("item") -> r.getAs[Long]("est")).toMap)
    perBatch.foldLeft(mg.zero)(mg.merge)
  }
}
