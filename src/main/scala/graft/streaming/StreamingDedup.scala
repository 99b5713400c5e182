package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental corpus deduplication — the streaming counterpart of the
  * batch exact-dedup (q16's md5 hash-groupBy): documents arrive in
  * micro-batches, and each doc gets a dedup VERDICT against every doc
  * ever seen, not just the current batch.
  *
  * Spark's built-in `dropDuplicates` on a stream silently discards
  * later copies; a curation pipeline needs to LOG the decision (which
  * doc was dropped, who its keeper is) to audit retention. So this uses
  * flatMapGroupsWithState keyed by content hash: state is one
  * (hash → first-seen keeper id) entry, every doc emits a verdict row,
  * output stays append-only (idempotent sinks stay simple).
  *
  * 100 TB posture: the groupByKey shuffles 16-byte md5 keys + doc ids —
  * never the text — and the state store partitions by hash, so each
  * partition owns a disjoint key range exactly like the reducers of the
  * batch hash-groupBy. State size is O(distinct content), the same
  * cardinality the batch job's final agg holds; watermark/TTL eviction
  * can bound it when the dedup horizon is finite.
  */
object StreamingDedup {

  final case class Doc(docId: Long, h: String)
  final case class Keeper(keeper: Long)
  final case class Verdict(doc_id: Long, keeper: Long, is_duplicate: Boolean)

  /** (doc_id, keeper, is_duplicate) per incoming doc; first arrival of
    * a content hash becomes its keeper (ties within a micro-batch break
    * by min doc id — deterministic replay).
    *
    * `stateTtlMs` bounds the dedup horizon: a hash unseen for the TTL
    * has its keeper evicted (processing-time timeout), after which the
    * content is treated as new — the knob that keeps state finite on an
    * unbounded stream when exact-forever dedup isn't required. Seeing
    * the hash again before expiry refreshes the clock. None = exact
    * dedup against all history (state O(distinct content)). */
  def verdicts(docs: DataFrame, idCol: String, textCol: String,
               stateTtlMs: Option[Long] = None): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[Keeper]
    implicit val outEnc = Encoders.product[Verdict]

    val keyed = docs
      .select(col(idCol).cast("long").as("docId"),
        md5(col(textCol)).as("h"))
      .as[Doc]

    def fn(h: String, batch: Iterator[Doc],
           state: GroupState[Keeper]): Iterator[Verdict] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = batch.toSeq.sortBy(_.docId)
        var keeper = state.getOption.map(_.keeper).getOrElse(-1L)
        val out = sorted.map { d =>
          if (keeper < 0L) { keeper = d.docId; Verdict(d.docId, keeper, false) }
          else Verdict(d.docId, keeper, d.docId != keeper)
        }
        if (keeper >= 0L) {
          state.update(Keeper(keeper))
          stateTtlMs.foreach(state.setTimeoutDuration)
        }
        out.iterator
      }
    }

    keyed.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        stateTtlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.ProcessingTimeTimeout))(fn)
  }
}
