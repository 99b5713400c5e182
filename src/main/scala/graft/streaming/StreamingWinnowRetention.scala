package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retention, TextAnalysis}

/** Streaming RETENTION twin — the last batch-only member of the
  * winnow family composed live: [[StreamingWinnowScreen.coPairs]]'
  * exactly-once co-occurrence evidence feeds the connected-components
  * map, and q238's quality-argmax keep/drop policy
  * ([[graft.operators.Retention]] — the SAME code the batch query
  * runs) is re-evaluated over the accumulated state per micro-batch,
  * so retention decisions UPDATE as crawl batches arrive: a newly
  * arrived better copy flips the previously-kept duplicate to drop.
  *
  * Two checkpointed streams over one doc source:
  *  1. `coPairs → pair log` (parquet append, exactly-once) — the
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

  /** The live composition: the coPairs stream lands in `pairLogPath`
    * via foreachBatch (append, exactly-once under the checkpoint) and
    * `onSnapshot` receives the refreshed keep set after every
    * micro-batch. `docStore` is the attrs store maintained by the
    * sibling stream (a plain parquet append of [[docAttrs]]) —
    * re-read per snapshot so restarts see everything ingested.
    * Caller adds checkpointLocation/trigger and starts. */
  def retentionWriter(docs: DataFrame, idCol: String, textCol: String,
                      pairLogPath: String, docStorePath: String)(
      onSnapshot: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[StreamingWinnowScreen.Emit] =
    StreamingWinnowScreen.coPairs(docs, idCol, textCol).writeStream
      .outputMode("append")
      .foreachBatch {
        (b: Dataset[StreamingWinnowScreen.Emit], _: Long) =>
          val spark = b.sparkSession
          b.toDF().write.mode("append").parquet(pairLogPath)
          onSnapshot(snapshot(
            spark.read.parquet(docStorePath),
            spark.read.parquet(pairLogPath)))
      }
}
