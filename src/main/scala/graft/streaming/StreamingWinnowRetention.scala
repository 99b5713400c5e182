package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.{Dedup, Retention, TextAnalysis}

/** Streaming RETENTION twin — the last batch-only member of the
  * winnow family composed live: [[StreamingWinnowScreen.coPairs]]'
  * co-occurrence evidence feeds the connected-components
  * map, and q238's quality-argmax keep/drop policy
  * ([[graft.operators.Retention]] — the SAME code the batch query
  * runs) is re-evaluated over the accumulated state per micro-batch,
  * so retention decisions UPDATE as crawl batches arrive: a newly
  * arrived better copy flips the previously-kept duplicate to drop.
  *
  * Two checkpointed streams over one doc source:
  *  1. `coPairs → pair log` (parquet append; foreachBatch is
  *     AT-LEAST-ONCE — a batch replayed after a crash appends its
  *     rows twice, and correctness holds because every downstream
  *     read is duplicate-insensitive: `confirmedPairs` counts
  *     DISTINCT fps and the saturated set is a `distinct`) — the
  *     online pair evidence, saturation tombstones included.
  *  2. `docAttrs → doc store` (parquet append) — (doc_id, source,
  *     tokens, packed) per arrival, per-row projections only.
  * [[snapshot]] then derives the CURRENT keep set from the two
  * stores: confirmed pairs (≥2 distinct non-saturated shared fps —
  * the batch screen's rule) → CC fixpoint → Retention.withKeep.
  * Keep decisions are a full snapshot per batch, NOT an append: a
  * keep flag is not monotone under arrivals, so the sink semantics
  * must be replace-latest (the spec certifies the snapshot equals the
  * from-scratch batch policy after every slice, any order, across
  * restarts).
  *
  * 100 TB posture: the stores carry (8-byte fp, ids) and 4-column doc
  * attrs — never text; the snapshot's joins are shuffle-hash on ids
  * (pair volume scales with duplication rate — the q199 no-broadcast
  * rule); CC runs on confirmed edges only; the argmax window
  * partitions per component with singleton fallback (no null
  * mega-partition). The per-snapshot CC fixpoint cost is bounded by
  * the CONFIRMED pair count, not corpus size — at production scale
  * snapshots would run on a cadence, not per micro-batch, which is a
  * trigger choice, not a code change. */
object StreamingWinnowRetention {

  /** [[docAttrs]]' output schema — pinned so an empty doc store reads
    * as an empty frame instead of a schema-inference failure. */
  val docStoreSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("tokens", LongType),
    StructField("packed", LongType)))

  /** Reads the doc-attrs store, falling back to an EMPTY frame when
    * the path has no parquet file yet: the pair stream and the
    * doc-attrs stream are independent checkpointed queries deployed
    * concurrently, so the pair stream's first micro-batch may commit
    * before the sibling has written anything — a raw
    * `spark.read.parquet` there throws and kills the streaming query.
    * An empty store is a valid state (snapshot = no keep decisions
    * yet), not an error. */
  def readDocStore(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData) spark.read.schema(docStoreSchema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], docStoreSchema)
  }

  /** Per-arrival doc attributes — per-row projections only, so the
    * plan is append-mode-legal on a stream and identical on a batch
    * frame. */
  def docAttrs(docs: DataFrame, idCol: String, srcCol: String,
               textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(srcCol).as("source"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("tokens"),
      Retention.packed(col(textCol), col(idCol).cast("long"))
        .as("packed"))

  /** Confirmed duplicate pairs from the accumulated coPairs log:
    * drop every fp that ever emitted a saturation tombstone (the
    * online df-cap — boilerplate evidence must not drive pairs), then
    * require ≥ 2 DISTINCT shared fingerprints per (doc_a, doc_b) —
    * exactly the batch screen's confirm. Distributed: anti-join on
    * the saturated fp set, hash-agg on the pair key. */
  def confirmedPairs(pairLog: DataFrame): DataFrame = {
    val sat = pairLog.filter(col("saturated"))
      .select(col("fp")).distinct()
    pairLog.filter(!col("saturated"))
      .join(sat.hint("shuffle_hash"), Seq("fp"), "left_anti")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count_distinct(col("fp")).as("nfp"))
      .filter(col("nfp") >= 2)
      .select(col("doc_a"), col("doc_b"))
  }

  /** The CURRENT keep/drop set from the two stores: (doc_id, source,
    * tokens, keep). Re-derivable at any point — the spec pins it
    * equal to the from-scratch batch policy on everything ingested. */
  def snapshot(docStore: DataFrame, pairLog: DataFrame): DataFrame = {
    val comps = Dedup.connectedComponents(confirmedPairs(pairLog))
    Retention.withKeep(docStore, comps)
      .select(col("doc_id"), col("source"), col("tokens"), col("keep"))
  }

  /** [[snapshot]]'s output schema — (doc_id, source, tokens, keep);
    * pinned for the empty-previous-snapshot fallback. */
  val snapshotSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("tokens", LongType),
    StructField("keep",
      org.apache.spark.sql.types.BooleanType)))

  /** The per-batch keep-flip DELTA between two snapshots — q249's
    * churn census live (r11 verdict item 2): one row per doc present
    * in BOTH snapshots whose keep flag changed, `change` = 'lost'
    * (was kept, a better copy arrived or its component re-formed) or
    * 'gained' (the q249 non-monotonicity: df-cap crossings split a
    * component and a previously-dropped doc inherits its fragment's
    * argmax). Docs only in `cur` are new arrivals, not flips — the
    * monitor's contract is "what changed about decisions already
    * published", which is exactly what a pre-publish reviewer diffs.
    * Distributed: one id-keyed shuffle-hash join, no collects. */
  def keepDelta(prev: DataFrame, cur: DataFrame): DataFrame =
    prev.select(col("doc_id"), col("keep").as("keep_prev"))
      .join(cur.select(col("doc_id"), col("source"),
        col("keep").as("keep_cur")).hint("shuffle_hash"), Seq("doc_id"))
      .filter(col("keep_prev") =!= col("keep_cur"))
      .select(col("doc_id"), col("source"),
        when(col("keep_prev"), lit("lost")).otherwise(lit("gained"))
          .as("change"))

  /** Latest persisted snapshot with id < `beforeId`, or an EMPTY
    * frame when none exists (first batch, or a wiped store). The
    * store layout is one subdirectory per snapshot
    * (`snap_id=<batchId>`), each written with per-directory
    * overwrite, so a foreachBatch REPLAY of batch N rewrites
    * `snap_id=N` in place and re-reads the same N−1 predecessor —
    * the delta is reproduced, not corrupted (at-least-once delivery
    * to the delta consumer, idempotent store). */
  def latestSnapshotBefore(spark: SparkSession, store: String,
                           beforeId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(p)) Array.empty[Long]
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("snap_id="))
        .map(_.stripPrefix("snap_id=").toLong)
        .filter(_ < beforeId)
    if (ids.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], snapshotSchema)
    else spark.read.schema(snapshotSchema)
      .parquet(s"$store/snap_id=${ids.max}")
  }

  /** The churn-delta composition: like [[retentionWriter]] but each
    * micro-batch also persists the keep snapshot under
    * `snapStorePath/snap_id=<batchId>` and hands `onDelta` the
    * [[keepDelta]] against the PREVIOUS persisted snapshot — the
    * per-crawl flip monitor (q249's census) as a live stream. Batch
    * ids are monotone across restarts under the checkpoint, so the
    * predecessor lookup (`max snap_id < batchId`) survives recovery;
    * a replayed batch overwrites its own snap dir and re-emits the
    * same delta. Old snapshots are retained for audit — a production
    * deployment would prune by age, a storage policy rather than a
    * correctness concern. `dfCap` feeds the online screen — pass
    * `SharedWinnow.adaptiveCap`'s value for the duplication-aware
    * deployment (the r12 calibration); the snapshot derivation needs
    * no cap of its own because saturation tombstones already encode
    * it in the pair log. */
  def deltaWriter(docs: DataFrame, idCol: String, textCol: String,
                  pairLogPath: String, docStorePath: String,
                  snapStorePath: String,
                  dfCap: Int = StreamingWinnowScreen.DfCap)(
      onDelta: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[StreamingWinnowScreen.Emit] =
    StreamingWinnowScreen.coPairs(docs, idCol, textCol, dfCap).writeStream
      .outputMode("append")
      .foreachBatch {
        (b: Dataset[StreamingWinnowScreen.Emit], batchId: Long) =>
          val spark = b.sparkSession
          b.toDF().write.mode("append").parquet(pairLogPath)
          snapshot(readDocStore(spark, docStorePath),
            spark.read.parquet(pairLogPath))
            .write.mode("overwrite")
            .parquet(s"$snapStorePath/snap_id=$batchId")
          val cur = spark.read.schema(snapshotSchema)
            .parquet(s"$snapStorePath/snap_id=$batchId")
          onDelta(keepDelta(
            latestSnapshotBefore(spark, snapStorePath, batchId), cur),
            batchId)
      }

  /** The live composition: the coPairs stream lands in `pairLogPath`
    * via foreachBatch (append; AT-LEAST-ONCE on replay — idempotent
    * downstream because the snapshot's reads are distinct-based) and
    * `onSnapshot` receives the refreshed keep set after every
    * micro-batch. `docStore` is the attrs store maintained by the
    * sibling stream (a plain parquet append of [[docAttrs]]) —
    * re-read per snapshot so restarts see everything ingested. The
    * two streams deploy concurrently, so the first pair batch may
    * commit before the doc store has any file yet — the snapshot
    * reads it with an explicit empty-frame fallback rather than
    * assuming an ordering between independent checkpoints.
    * Caller adds checkpointLocation/trigger and starts. */
  def retentionWriter(docs: DataFrame, idCol: String, textCol: String,
                      pairLogPath: String, docStorePath: String,
                      dfCap: Int = StreamingWinnowScreen.DfCap)(
      onSnapshot: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[StreamingWinnowScreen.Emit] =
    StreamingWinnowScreen.coPairs(docs, idCol, textCol, dfCap).writeStream
      .outputMode("append")
      .foreachBatch {
        (b: Dataset[StreamingWinnowScreen.Emit], _: Long) =>
          val spark = b.sparkSession
          b.toDF().write.mode("append").parquet(pairLogPath)
          onSnapshot(snapshot(
            readDocStore(spark, docStorePath),
            spark.read.parquet(pairLogPath)))
      }
}
