package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequential funnel — the cross-batch counterpart of
  * operators/Funnel: per-user greedy step progression kept as
  * checkpoint state, conversions emitted the moment the LAST step
  * completes. The greedy invariant makes funnels incremental: with
  * events processed in event-time order, step k's earliest-feasible
  * time depends only on earlier events, so a batch boundary can never
  * change the outcome — StreamingFunnelSpec proves final conversions
  * equal the batch Funnel.stepTimes for ANY slicing of the stream.
  *
  * Ordering contract: events are sorted per user WITHIN a batch; an
  * event arriving in a LATER batch with an EARLIER timestamp than one
  * already consumed may be assigned differently than a global batch
  * sort would (same contract as StatefulSessions — feed by watermarked
  * event time for exactness). State is one fixed-size array of step
  * times per user: O(users · steps), emitted rows are append-only. */
object StreamingFunnel {

  final case class Event(user: Long, step: Int, ms: Long)
  final case class FunnelState(times: Seq[Long]) // -1 = step not reached
  final case class Conversion(user: Long, times: Seq[Long])

  /** `nSteps` funnel over pre-mapped step indices (0-based; map event
    * types to indices upstream). Emits one Conversion per user, when
    * step nSteps-1 first completes. `maxGapMs < 0` disables windows.
    *
    * State lifetime: by default state is kept forever (NoTimeout) —
    * the batch-parity contract, right for bounded replays and tests.
    * On a long-running stream with unbounded user cardinality that is
    * unbounded state growth, so `idleTimeoutMs ≥ 0` switches to an
    * EVENT-TIME timeout: a user whose last event is idle past the
    * timeout (by watermark time) has their state dropped — a
    * half-completed funnel then restarts from step 0 if the user
    * returns. Requires `withWatermark` on the input's event-time
    * column; pick idleTimeoutMs ≥ maxGapMs·nSteps so no still-viable
    * conversion can be evicted. */
  def run(events: Dataset[Event], nSteps: Int,
          maxGapMs: Long = -1L, idleTimeoutMs: Long = -1L): Dataset[Conversion] = {
    require(nSteps >= 1)
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Conversion]
    import events.sparkSession.implicits._

    def fn(user: Long, batch: Iterator[Event],
           state: GroupState[FunnelState]): Iterator[Conversion] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val t = state.getOption
          .map(_.times.toArray)
          .getOrElse(Array.fill(nSteps)(-1L))
        val alreadyDone = t(nSteps - 1) >= 0
        val batchSeq = batch.toSeq
        batchSeq.sortBy(e => (e.ms, e.step)).foreach { e =>
          if (e.step >= 0 && e.step < nSteps) {
            val prevOk =
              if (e.step == 0) t(0) < 0
              else t(e.step) < 0 && t(e.step - 1) >= 0 &&
                e.ms > t(e.step - 1) &&
                (maxGapMs < 0 || e.ms <= t(e.step - 1) + maxGapMs)
            if (prevOk) t(e.step) = e.ms
          }
        }
        state.update(FunnelState(t.toSeq))
        if (idleTimeoutMs >= 0 && batchSeq.nonEmpty) {
          // deadline from the latest activity SEEN (batch max or an
          // already-recorded step time) — a late batch must never
          // SHRINK the deadline; and clamp above the watermark: Spark
          // throws on a timeout timestamp at/below it, and late rows
          // DO reach this function (no pre-filter), so an old-ms
          // straggler would otherwise kill the whole query
          val lastSeen = (batchSeq.map(_.ms) ++ t.filter(_ >= 0)).max
          state.setTimeoutTimestamp(
            math.max(lastSeen + idleTimeoutMs,
              state.getCurrentWatermarkMs() + 1))
        }
        if (!alreadyDone && t(nSteps - 1) >= 0)
          Iterator(Conversion(user, t.toSeq))
        else Iterator.empty
      }
    }

    val timeoutConf =
      if (idleTimeoutMs >= 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }
}
