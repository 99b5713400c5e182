package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming session PATHS — the q140 census's streaming twin: gap
  * -based sessions whose first `maxLen` event types are joined into a
  * '>'-path, emitted once when the session closes (the
  * [[StatefulSessions]] emission policy, with the path accumulated in
  * state instead of just counts). State per open session is bounded by
  * construction: `maxLen` short strings + two timestamps, however long
  * the session runs.
  *
  * Parity contract (spec-asserted): closed paths == the batch
  * `EventAnalytics.sessionPaths` per-session paths on the same events
  * when batch BOUNDARIES respect event-time order (within-batch
  * disorder is sorted away; an event arriving in a later batch but
  * timestamped before state's lastMs appends behind it — the same
  * last-wins posture as [[StatefulSessions]], which a watermark
  * enforces in production).
  */
object StatefulPaths {

  final case class Event(user: Long, eventId: Long, ms: Long, et: String)
  final case class PathState(
      sessionId: Long, lastMs: Long, n: Long, path: List[String])
  final case class ClosedPath(
      user: Long, sessionId: Long, nEvents: Long, path: String)

  def sessionize(events: Dataset[Event], gapMs: Long,
                 maxLen: Int): Dataset[ClosedPath] = {
    implicit val stateEnc = Encoders.product[PathState]
    implicit val outEnc = Encoders.product[ClosedPath]
    import events.sparkSession.implicits._

    def fn(user: Long, batch: Iterator[Event],
           state: GroupState[PathState]): Iterator[ClosedPath] = {
      val sorted = batch.toSeq.sortBy(e => (e.ms, e.eventId))
      var cur = state.getOption.orNull
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedPath]
      def close(st: PathState): Unit =
        closed += ClosedPath(user, st.sessionId, st.n,
          st.path.reverse.mkString(">"))
      sorted.foreach { e =>
        if (cur == null) {
          cur = PathState(1L, e.ms, 1L, List(e.et))
        } else if (e.ms - cur.lastMs > gapMs) {
          close(cur)
          cur = PathState(cur.sessionId + 1L, e.ms, 1L, List(e.et))
        } else {
          val p = if (cur.n < maxLen) e.et :: cur.path else cur.path
          cur = cur.copy(lastMs = math.max(cur.lastMs, e.ms),
            n = cur.n + 1L, path = p)
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
