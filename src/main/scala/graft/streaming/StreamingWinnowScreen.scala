package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{KmvSketch, TextAnalysis}

/** Streaming twin of the winnowed-fingerprint dedup screen
  * (q226/q227): documents arriving in micro-batches emit
  * fingerprint-co-occurrence pairs against every doc ever seen that
  * shares a winnowed fingerprint, with the batch screen's df-cap
  * enforced ONLINE — a bucket that grows past the cap emits one
  * saturation tombstone and goes silent, so downstream drops its
  * earlier pairs (boilerplate fingerprints must never drive pair
  * generation, exactly the batch rule).
  *
  * Composition (the [[StreamingNearDup]] recipe):
  *  1. [[fingerprintsNarrow]] computes each doc's winnowed
  *     fingerprint SET as per-row array expressions — no aggregation,
  *     so the plan runs in streaming append mode; the set equals the
  *     batch distinct-(doc, fp) of per-window minima (min-set
  *     equality is indexing-invariant; parity spec-pinned).
  *  2. flatMapGroupsWithState keyed by fp holds the bucket member
  *     list — BOUNDED at DfCap+1 longs by the saturation rule — and
  *     emits (new × existing + new × new) co-occurrence rows per
  *     arrival.
  *
  * Pair semantics: a downstream ≥2-shared-fp confirm over the emitted
  * co-occurrences (minus saturated buckets) equals the batch q226
  * screen for any slicing of the input — the spec certifies exactly
  * that equality.
  *
  * 100 TB posture: the shuffle carries (8-byte fp, doc id) — never
  * text or gram strings; state is ≤ DfCap+1 longs per ACTIVE bucket
  * (saturated buckets hold a flag and an empty array); per-bucket
  * work is O(batch members × cap). */
object StreamingWinnowScreen {

  /** Batch df-cap mirrored online: buckets with more members are
    * boilerplate and generate nothing. */
  val DfCap = 16

  final case class FpRow(fp: Long, docId: Long)
  final case class Bucket(members: Array[Long], saturated: Boolean)
  final case class Emit(fp: Long, doc_a: Long, doc_b: Long,
                        saturated: Boolean)

  /** Per-doc winnowed fingerprints (w = 4 over word-4-gram hash32) as
    * pure per-row array expressions: one (docId, fp) row per distinct
    * selected fingerprint; docs with fewer than 4 grams emit none. */
  def fingerprintsNarrow(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("docId"),
        TextAnalysis.wordNgrams(col(textCol), 4).as("gs"))
      // FENCED (r10 audit): the ≥4 filter otherwise re-expands the
      // whole gram+hash chain into the predicate (2× per doc)
      .withColumn("hs", graft.plans.FenceExpr.fence(
        transform(col("gs"), g => KmvSketch.hash32(g))))
      .filter(size(col("hs")) >= 4)
      .withColumn("fps", array_distinct(transform(
        sequence(lit(1), size(col("hs")) - 3),
        j => array_min(slice(col("hs"), j, lit(4))))))
      .select(col("docId"), explode(col("fps")).as("fp"))

  /** Append-only co-occurrence stream: one (fp, doc_a, doc_b) row per
    * new same-bucket pair (doc_a < doc_b), plus ONE
    * (fp, -1, -1, saturated = true) tombstone the moment a bucket
    * crosses the cap — downstream must discard that fp's pairs.
    *
    * `dfCap` defaults to the fixed [[DfCap]]; a duplication-aware
    * deployment passes `SharedWinnow.adaptiveCap`'s value instead
    * (the r11 finding: a FIXED cap silently drops real duplicate
    * families as corpus duplication grows — q235/q246/q249), making
    * the online screen the same parameterized policy as the batch
    * `cappedPairsAt`. The cap is a per-query constant: state stays
    * bounded at cap+1 longs per active bucket. */
  def coPairs(docs: DataFrame, idCol: String, textCol: String,
              dfCap: Int = DfCap): Dataset[Emit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[Bucket]
    implicit val outEnc = Encoders.product[Emit]
    val rows = fingerprintsNarrow(docs, idCol, textCol).as[FpRow]
    // local copy: referencing a method parameter is closure-safe; the
    // val also keeps the (non-serializable) module out of the task
    val cap = dfCap

    def fn(fp: Long, batch: Iterator[FpRow],
           state: GroupState[Bucket]): Iterator[Emit] = {
      val cur = state.getOption.getOrElse(Bucket(Array.empty, false))
      if (cur.saturated) Iterator.empty
      else {
        val old = cur.members
        val fresh = batch.map(_.docId).toArray.distinct.sorted
          .filterNot(old.contains)
        if (fresh.isEmpty) Iterator.empty
        else if (old.length + fresh.length > cap) {
          state.update(Bucket(Array.empty, saturated = true))
          Iterator.single(Emit(fp, -1L, -1L, saturated = true))
        } else {
          val out = Seq.newBuilder[Emit]
          for (m <- fresh; o <- old)
            out += Emit(fp, math.min(m, o), math.max(m, o), false)
          for (i <- fresh.indices; k <- (i + 1) until fresh.length)
            out += Emit(fp, fresh(i), fresh(k), false)
          state.update(Bucket((old ++ fresh).sorted, saturated = false))
          out.result().iterator
        }
      }
    }

    rows.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
