package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Incremental NEAR-dup candidate generation — the streaming form of
  * the batch MinHash→LSH→star-edge pipeline (q17/q40): documents
  * arriving in micro-batches emit star edges against every doc ever
  * seen that shares an LSH band bucket.
  *
  * Composition:
  *  1. [[Dedup.lshBandKeysNarrow]] computes each doc's band keys as
  *     per-row array expressions — NO aggregation, which is what lets
  *     the plan run in streaming append mode (and, incidentally, the
  *     zero-shuffle signature path).
  *  2. flatMapGroupsWithState keyed by band key holds ONE long per
  *     bucket — the hub (first-seen min member) — and emits a
  *     (hub, member) edge per new arrival.
  *
  * The resulting edge stream has the same reachability as the batch
  * [[Dedup.lshStarEdges]] graph (every bucket member connects to its
  * bucket's hub; WHICH member is hub differs — first-seen min vs global
  * min — but connected components are identical), so downstream
  * clustering composes unchanged.
  *
  * 100 TB posture: the shuffle carries (16-byte band key, doc id) —
  * never text or signatures; state is one id per occupied bucket,
  * bounded by distinct buckets, not docs; per-bucket work is O(batch
  * members), the streaming analog of the star reduction that kills the
  * hot-bucket clique blowup in batch.
  */
object StreamingNearDup {

  final case class Banded(docId: Long, bk: String)
  final case class Hub(hub: Long)
  final case class Edge(doc_a: Long, doc_b: Long)

  /** (hub, member) candidate edges, append-only. Self-edges are never
    * emitted; a doc landing in several shared buckets emits one edge
    * per bucket (downstream components dedup naturally).
    *
    * `stateTtlMs` bounds the dedup horizon: a bucket with no arrivals
    * for the TTL has its hub evicted (processing-time timeout), so a
    * later member starts a fresh hub — near-dups are then only linked
    * within the horizon, and state stays bounded by the number of
    * buckets ACTIVE in any TTL window instead of all buckets ever
    * occupied. Arrivals refresh the bucket's clock. None = link against
    * all history. */
  def starEdges(docs: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int, bands: Int,
                stateTtlMs: Option[Long] = None): Dataset[Edge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[Hub]
    implicit val outEnc = Encoders.product[Edge]

    val banded = Dedup.lshBandKeysNarrow(docs, idCol, textCol, n, k, bands)
      .toDF("docId", "bk").as[Banded]

    def fn(bk: String, batch: Iterator[Banded],
           state: GroupState[Hub]): Iterator[Edge] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val members = batch.map(_.docId).toSeq.sorted.distinct
        if (members.isEmpty) Iterator.empty
        else {
          val out = Seq.newBuilder[Edge]
          val hub = state.getOption.map(_.hub).getOrElse {
            members.head // first-seen min member becomes the bucket hub
          }
          members.foreach(m => if (m != hub) out += Edge(hub, m))
          state.update(Hub(hub))
          stateTtlMs.foreach(state.setTimeoutDuration)
          out.result().iterator
        }
      }
    }

    banded.groupByKey(_.bk)
      .flatMapGroupsWithState(OutputMode.Append,
        stateTtlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.ProcessingTimeTimeout))(fn)
  }
}
