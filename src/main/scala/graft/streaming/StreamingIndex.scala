package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TrainPrep

/** Incremental inverted-index maintenance over a document stream —
  * the streaming twin of [[graft.operators.TrainPrep.postings]],
  * built on posting-delta MERGEABILITY instead of unbounded operator
  * state (the StreamingHeavyHitters/BatchSink recipe):
  *
  *  - each micro-batch tokenizes ITS documents and writes the batch's
  *    partial postings (term, doc_id, tf_doc) to `dir/batch=<id>` —
  *    overwriting its OWN directory, so crash-replay of a batch is
  *    idempotent (batch-id-keyed artifacts ⇒ exactly-once without
  *    sink transactions);
  *  - the queryable index at any moment = one grouped merge of the
  *    committed deltas ([[index]]), identical to re-indexing from
  *    scratch — asserted spec-side against the batch operator;
  *  - compaction is the SAME merge written back as a new base — run it
  *    whenever |batches| grows past taste.
  *
  * 100 TB posture: per-batch cost is the batch's own token
  * aggregation (partial aggs, one term-keyed shuffle); nothing global
  * re-runs, and no state store holds the corpus. The merge-on-read
  * shuffles posting rows, not documents. */
object StreamingIndex {

  /** Per-batch posting delta: (term, doc_id, tf_doc). */
  def batchPostings(docs: DataFrame): DataFrame = TrainPrep.termDocs(docs)

  /** Start the index-maintaining query; docs needs (doc_id, text). */
  def run(docs: DataFrame, dir: String, checkpoint: String,
          configure: org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] => org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row] = identity): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        batchPostings(df)
          .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      }
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
    configure(w).start()
  }

  /** The merged (term, doc_id, tf_doc) posting frame over every
    * committed batch — re-crawled docs' tf_doc deltas sum. This is the
    * frame search reads: [[index]] summarizes it, and
    * [[graft.operators.TrainPrep.bm25RankFromPostings]] ranks straight
    * off it (doc lengths derive from the postings themselves), so the
    * incremental index serves BM25 queries with batch parity. Before
    * any batch commits, the frame is EMPTY, not an error. */
  def mergedTermDocs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val deltaSchema = StructType(Seq(
      StructField("term", StringType), StructField("doc_id", LongType),
      StructField("tf_doc", LongType)))
    val hasData = {
      val d = new java.io.File(dir)
      d.isDirectory && d.listFiles().exists(_.getName.startsWith("batch="))
    }
    val deltas =
      if (hasData) spark.read.schema(deltaSchema).parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], deltaSchema)
    deltas
      .groupBy(col("term"), col("doc_id"))
      .agg(sum(col("tf_doc")).as("tf_doc"))
  }

  /** The merged index: same schema and content as
    * [[TrainPrep.postings]] over every document the stream has
    * committed (the summary aggregation is TrainPrep.postingsFrom —
    * one digest format). */
  def index(spark: SparkSession, dir: String): DataFrame =
    TrainPrep.postingsFrom(mergedTermDocs(spark, dir))
}
