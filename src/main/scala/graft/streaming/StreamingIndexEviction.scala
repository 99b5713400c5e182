package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming twin of q233's gram-index TTL aging: documents arriving
  * in micro-batches maintain the stored 8-gram index's
  * last_seen = max(ingestion epoch) per gram ONLINE, so eviction
  * (drop grams with last_seen < cutoff) is a filter over live state
  * instead of a periodic window rebuild. q233's oracle certifies the
  * batch side (last_seen ≥ cutoff ⟺ some retaining doc contains the
  * gram); this module certifies the stream side: the streamed
  * last_seen map — and therefore the aged index — equals the batch
  * from-scratch map for ANY slicing of the input, including
  * out-of-order epoch arrival, because max is commutative and
  * idempotent over re-deliveries of the same (gram, epoch).
  *
  * Composition (the [[StreamingWinnowScreen]] recipe):
  *  1. [[gramEpochs]] extracts (gh, epoch) rows map-side — per-row
  *     expressions only, so the plan runs in streaming append mode.
  *  2. flatMapGroupsWithState keyed by the 32-hex-char gram key holds
  *     one int (the running max) and emits a change row only when the
  *     max advances — so the downstream sink sees a monotone update
  *     log whose per-gram max IS the index.
  *
  * 100 TB posture: state is ONE int per distinct gram (the same
  * cardinality the stored batch artifact pays); the shuffle carries
  * (32-byte key, int) rows; re-seen grams at stale epochs emit
  * nothing. Eviction never re-reads history text — the exact property
  * q233 exists to prove. */
object StreamingIndexEviction {

  final case class GramRow(gh: String, epoch: Int)
  final case class Seen(lastSeen: Int)
  final case class Upd(gh: String, last_seen: Int)

  /** Per-row 8-gram extraction: one (gh, epoch) row per gram
    * occurrence, gh = hex md5 of the space-joined gram (q233's index
    * identity). `epochCol` is evaluated against the input row — a
    * real pipeline passes its ingestion-batch stamp; the parity spec
    * passes q233's (doc_id div 20) % 5. */
  def gramEpochs(docs: DataFrame, textCol: String,
                 epochCol: Column): DataFrame =
    docs
      .select(epochCol.cast("int").as("epoch"),
        explode(TextAnalysis.wordNgrams(col(textCol), 8)).as("g"))
      .select(md5(col("g")).as("gh"), col("epoch"))

  /** Append-only change log: one (gh, last_seen) row whenever a
    * gram's running max epoch advances (including first sight). The
    * per-gram MAX over all emitted rows equals the batch index's
    * last_seen column at every point in stream time. */
  def lastSeenUpdates(docs: DataFrame, textCol: String,
                      epochCol: Column): Dataset[Upd] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[Seen]
    implicit val outEnc = Encoders.product[Upd]
    val rows = gramEpochs(docs, textCol, epochCol).as[GramRow]

    def fn(gh: String, batch: Iterator[GramRow],
           state: GroupState[Seen]): Iterator[Upd] = {
      val incoming = batch.map(_.epoch).max
      val cur = state.getOption
      if (cur.forall(_.lastSeen < incoming)) {
        state.update(Seen(incoming))
        Iterator.single(Upd(gh, incoming))
      } else Iterator.empty
    }

    rows.groupByKey(_.gh)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
