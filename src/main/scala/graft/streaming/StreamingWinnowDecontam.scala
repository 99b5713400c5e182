package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WINNOW-BASED decontamination screen — the live
  * counterpart of batch q234, completing the symmetry
  * q199 ↔ [[StreamingDecontam]] :: q234 ↔ this: documents arriving in
  * micro-batches are screened at crawl time against a FIXED benchmark
  * set's winnowed-fingerprint index, flagging any arrival that shares
  * ≥2 fingerprints (shared-span evidence) with a benchmark doc.
  *
  * Composition:
  *  1. [[StreamingWinnowScreen.fingerprintsNarrow]] — per-row
  *     fingerprint sets, append-mode-legal.
  *  2. A STREAM-STATIC equi-join on the 8-byte fingerprint against
  *     the pre-built benchmark index. The static side is
  *     benchmark-sized by construction (the q199/q234 rule), so the
  *     broadcast is safe and the stream side never shuffles for the
  *     join. No corpus-side df-cap is needed in THIS shape: per
  *     arriving row the join fan-out is bounded by the benchmark
  *     df of that fingerprint — the batch screen's cap guards the
  *     at-rest corpus×bench join, a hazard the stream-static join
  *     does not have. The spec therefore pins parity against the
  *     UNCAPPED batch screen.
  *  3. flatMapGroupsWithState keyed by the (doc, bench) pair enforces
  *     the ≥2-DISTINCT-shared rule and emits each hit exactly once.
  *     State is TWO fields per candidate pair (first-seen fp +
  *     emitted flag) — hit-proportional, never corpus-proportional.
  *
  * 100 TB posture: one codegen'd projection per doc, an 8-byte-keyed
  * broadcast join, bounded pair state; text and grams never enter an
  * exchange. [[confirm]]/[[confirmedWriter]] close the pipeline:
  * q234's containment confirm runs per micro-batch on the RARE hit
  * stream (foreachBatch against the stored corpus fp index), so the
  * expensive stage's input is hit-proportional. */
object StreamingWinnowDecontam {

  final case class JRow(docId: Long, benchId: Long, fp: Long)
  final case class PairSt(firstFp: Long, emitted: Boolean)
  final case class Hit(doc_id: Long, bench_id: Long)

  /** Pre-built benchmark fingerprint index: distinct (bench_id, fp).
    * Build ONCE from the static benchmark frame; every micro-batch
    * joins against it. */
  def benchIndex(bench: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    StreamingWinnowScreen.fingerprintsNarrow(bench, idCol, textCol)
      .select(col("docId").as("benchId"), col("fp")).distinct()

  /** Append-only (doc_id, bench_id) hit stream: one row per pair the
    * moment its second distinct shared fingerprint arrives. Works
    * identically on a batch frame (the parity the spec pins). */
  def hits(docs: DataFrame, idCol: String, textCol: String,
           benchIdx: DataFrame): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[PairSt]
    implicit val outEnc = Encoders.product[Hit]
    val joined = StreamingWinnowScreen
      .fingerprintsNarrow(docs, idCol, textCol)
      .join(broadcast(benchIdx), "fp")
      .select(col("docId"), col("benchId"), col("fp")).as[JRow]

    def fn(key: (Long, Long), batch: Iterator[JRow],
           state: GroupState[PairSt]): Iterator[Hit] = {
      val cur = state.getOption
      if (cur.exists(_.emitted)) Iterator.empty
      else {
        // fingerprintsNarrow emits each doc's fps distinct, but the
        // same fp can recur across re-deliveries — dedup in the fold
        val fps = batch.map(_.fp).toSet ++ cur.map(_.firstFp)
        if (fps.size >= 2) {
          state.update(PairSt(fps.head, emitted = true))
          Iterator.single(Hit(key._1, key._2))
        } else {
          state.update(PairSt(fps.head, emitted = false))
          Iterator.empty
        }
      }
    }

    joined.groupByKey(r => (r.docId, r.benchId))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** q234's UNCAPPED containment confirm over a micro-batch of screen
    * hits: keep (doc, bench) iff ≥ `minPpm` of the bench doc's
    * fingerprints appear in the train doc's (integer ppm arithmetic,
    * the batch query's exact rule). `trainFp` is the STORED corpus
    * fingerprint index — (docId, fp) distinct, the artifact
    * [[StreamingIndexEviction]]-style pipelines maintain anyway — so
    * the confirm never re-reads train text. Every join is hinted
    * shuffle-hash: the hit batch scales with contamination rate ×
    * corpus size, so nothing here may become a data-dependent
    * broadcast (the q199 r7 lesson). Fan-out is
    * |hits| × fps-per-doc on the index joins, then hash-keyed
    * aggregation — hit-proportional, never corpus-proportional. */
  def confirm(hitBatch: DataFrame, trainFp: DataFrame,
              benchIdx: DataFrame, minPpm: Long = 500000L): DataFrame = {
    val szb = benchIdx.groupBy(col("benchId")).agg(count(lit(1)).as("szb"))
    hitBatch.select(col("doc_id"), col("bench_id"))
      .join(trainFp.select(col("docId").as("doc_id"), col("fp"))
        .hint("shuffle_hash"), "doc_id")
      .join(benchIdx.select(col("benchId").as("bench_id"), col("fp"))
        .hint("shuffle_hash"), Seq("bench_id", "fp"))
      .groupBy(col("doc_id"), col("bench_id")).agg(count(lit(1)).as("i"))
      .join(szb.select(col("benchId").as("bench_id"), col("szb"))
        .hint("shuffle_hash"), "bench_id")
      .filter(expr("i * 1000000 div szb") >= minPpm)
      .select(col("doc_id"), col("bench_id"))
  }

  /** The full q234 pipeline LIVE: screen [[hits]] → foreachBatch
    * containment [[confirm]] against the stored index. Returns the
    * configured writer — caller adds checkpointLocation/trigger and
    * starts it. `onBatch` receives each micro-batch's CONFIRMED
    * (doc_id, bench_id) frame; hits are exactly-once, so so are
    * confirmed links (the confirm is a deterministic per-hit
    * predicate — re-delivery can only come from sink-side replay,
    * which checkpointing already owns). */
  def confirmedWriter(docs: DataFrame, idCol: String, textCol: String,
                      benchIdx: DataFrame, trainFp: DataFrame,
                      minPpm: Long = 500000L)(
      onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Hit] =
    hits(docs, idCol, textCol, benchIdx).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Hit], _: Long) =>
        onBatch(confirm(b.toDF(), trainFp, benchIdx, minPpm))
      }
}
