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
  * exchange. Containment confirm (q234's second stage) belongs
  * downstream on the rare hit stream via foreachBatch. */
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
}
