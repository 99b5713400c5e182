package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom cross-batch state: gap-based sessionization with
  * flatMapGroupsWithState — the streaming counterpart of the batch
  * q30_sessionize window composition, and the §2.8 "stateful ops" tier
  * the reference never needed (its only state is an advisory DNS cache;
  * SURVEY §2.8). State lives in the checkpoint: a session stays open
  * across micro-batches (and across restarts) until a gap closes it.
  *
  * Emission policy: a session is emitted exactly once, when closed by a
  * later event beyond the gap. Open sessions are queryable only as
  * state, keeping output append-only (idempotent sinks stay simple).
  */
object StatefulSessions {

  final case class Event(user: Long, ms: Long)
  final case class SessionState(
      sessionId: Long, startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(
      user: Long, sessionId: Long, nEvents: Long, durMs: Long)

  def sessionize(events: Dataset[Event],
                 gapMs: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    import events.sparkSession.implicits._

    def fn(user: Long, batch: Iterator[Event],
           state: GroupState[SessionState]): Iterator[ClosedSession] = {
      val sorted = batch.toSeq.sortBy(e => (e.ms))
      var cur = state.getOption.orNull
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      sorted.foreach { e =>
        if (cur == null) {
          cur = SessionState(1L, e.ms, e.ms, 1L)
        } else if (e.ms - cur.lastMs > gapMs) {
          closed += ClosedSession(user, cur.sessionId, cur.n,
            cur.lastMs - cur.startMs)
          cur = SessionState(cur.sessionId + 1L, e.ms, e.ms, 1L)
        } else {
          cur = cur.copy(lastMs = math.max(cur.lastMs, e.ms), n = cur.n + 1L)
        }
      }
      if (cur != null) state.update(cur)
      closed.iterator
    }

    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
