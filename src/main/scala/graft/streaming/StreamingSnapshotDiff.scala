package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SnapshotDiff

/** Streaming CDC — the changelog-stream counterpart of the batch
  * [[graft.operators.SnapshotDiff]]: records arrive in micro-batches
  * and every key's change status is judged against the LAST STATE EVER
  * SEEN, not the current batch. Emits an append-only verdict stream
  * (key, status ∈ added|changed|unchanged|removed, batch-relative
  * order by key within a group), the audit log a downstream consumer
  * replays.
  *
  * Deletions are explicit tombstones (null row hash) — the standard
  * changelog convention: a stream cannot observe absence, so removals
  * must be stated. A tombstone for an unknown key emits nothing.
  *
  * 100 TB posture: the shuffle carries (key, 16-byte hash) — the
  * compared columns are hashed in the scan stage exactly like the
  * batch diff; state is one hash per live key, partitioned by key
  * range in the state store (the streaming analog of the batch
  * full-outer join's co-partitioning). `stateTtlMs` bounds state for
  * keys that stop arriving, trading "removed-vs-added after horizon"
  * precision for bounded state — same knob as StreamingDedup. */
object StreamingSnapshotDiff {

  final case class Rec(key: Long, h: String)
  final case class LastHash(h: String)
  final case class Change(key: Long, status: String)

  /** Verdicts for a changelog stream. `keyCol` must cast to long;
    * `compareCols` feed the row hash; rows where `tombstoneCol` (if
    * given) is true are deletions. */
  def changes(records: DataFrame, keyCol: String, compareCols: Seq[String],
              tombstoneCol: Option[String] = None,
              stateTtlMs: Option[Long] = None): Dataset[Change] = {
    val spark = records.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[LastHash]
    implicit val outEnc = Encoders.product[Change]

    val hashExpr = tombstoneCol match {
      case Some(t) => when(col(t), lit(null).cast("string"))
        .otherwise(SnapshotDiff.rowHash(compareCols.map(col)))
      case None => SnapshotDiff.rowHash(compareCols.map(col))
    }
    val keyed = records
      .select(col(keyCol).cast("long").as("key"), hashExpr.as("h"))
      .as[Rec]

    def fn(key: Long, batch: Iterator[Rec],
           state: GroupState[LastHash]): Iterator[Change] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // within a batch, apply records in deterministic order (hash
        // asc, tombstones last) — a changelog with intra-batch order
        // would carry a sequence column and sort by it here instead
        val ordered = batch.toSeq.sortBy(r => (r.h == null, r.h))
        val out = Seq.newBuilder[Change]
        var last = state.getOption.map(_.h).orNull
        ordered.foreach { r =>
          if (r.h == null) {
            if (last != null) { out += Change(key, "removed"); last = null }
          } else if (last == null) {
            out += Change(key, "added"); last = r.h
          } else if (last != r.h) {
            out += Change(key, "changed"); last = r.h
          } else out += Change(key, "unchanged")
        }
        if (last == null) state.remove()
        else {
          state.update(LastHash(last))
          stateTtlMs.foreach(state.setTimeoutDuration)
        }
        out.result().iterator
      }
    }

    keyed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        stateTtlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.ProcessingTimeTimeout))(fn)
  }
}
