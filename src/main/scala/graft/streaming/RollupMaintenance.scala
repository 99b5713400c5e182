package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained hourly event rollup — the materialized
  * -view pattern for the monitoring readouts (rate anomalies, forecast
  * backtest): instead of rescanning the event stream per question, a
  * streaming query maintains per-batch (event_type, hr, n) COUNT
  * DELTAS and readers merge on read.
  *
  *  - each micro-batch aggregates ITS OWN events to the rollup grain
  *    (a batch-local hash agg — events never cross batches) and writes
  *    the delta to `dir/batch=<id>`, overwriting its own directory, so
  *    a crash-replayed batch is idempotent (the BatchSink /
  *    StreamingHeavyHitters batch-id-keyed artifact pattern);
  *  - counts are ADDITIVE, so merged deltas == from-scratch rollup for
  *    ANY slicing of the stream into batches (spec-asserted), with no
  *    cross-batch state at all — the checkpoint carries only source
  *    offsets;
  *  - readers ([[mergedHourly]] → `EventAnalytics
  *    .rateAnomaliesFromHourly` / `forecastBacktestFromHourly`) touch
  *    |hours|·|types| rows per committed batch — rollup scale, never
  *    event scale. Compaction (summing old batch deltas into one) is
  *    the same merge and can run any time.
  */
object RollupMaintenance {

  /** Start the delta-writing query over a stream with columns
    * (event_type, ms). */
  def run(events: DataFrame, dir: String, checkpoint: String,
          configure: org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] => org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] = identity): StreamingQuery = {
    val w = events
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.operators.EventAnalytics.hourlyCounts(df)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$dir/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
    configure(w).start()
  }

  /** Merge-on-read rollup: sum the per-batch deltas. Additivity makes
    * this equal to aggregating the full event history, however the
    * stream was sliced. */
  def mergedHourly(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("event_type"), col("hr"))
      .agg(sum(col("n")).as("n"))
}
