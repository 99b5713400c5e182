package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming CHUNK-level dedup — [[StreamingDedup]]'s twin at the
  * paragraph/chunk granularity, and the live counterpart of the batch
  * q167 rebuild and the q173 stored-index incremental: documents
  * arrive in micro-batches, every n-word chunk is judged against every
  * chunk ever seen, and each chunk emits an auditable verdict (its
  * keeper position and a duplicate flag) so a downstream rebuild knows
  * exactly which spans survive.
  *
  * Keeper identity is the PACKED POSITION doc_id·100000 + chunk_idx —
  * the same total order the batch keep-first window uses — so with
  * arrival order respecting the position order (the crawl-order
  * convention every incremental operator here shares) the stream's
  * verdicts equal the batch window's, row for row; within one
  * micro-batch the sort below restores the order regardless of
  * partition interleaving. Out-of-order arrivals degrade exactly like
  * [[StreamingDedup]]: first arrival wins — last-wins/first-wins
  * posture, never corruption.
  *
  * 100 TB posture: the groupByKey shuffles (16-byte md5, packed long)
  * pairs — chunk text never leaves the mapper (the md5 happens inside
  * the scan projection) — and the state store holds ONE long per
  * distinct chunk, partitioned by hash exactly like the batch
  * hash-groupBy's reducers. `stateTtlMs` bounds the horizon when
  * exact-forever chunk dedup isn't required.
  */
object StreamingChunkDedup {

  final case class Chunk(packed: Long, h: String)
  final case class Keeper(keeper: Long)
  final case class Verdict(doc_id: Long, chunk_idx: Int, keeper: Long,
                           is_duplicate: Boolean)

  /** Per-chunk verdicts for a streaming `docs` frame carrying
    * (idCol, textCol): chunk = n-word window (trailing partial kept,
    * [[TextAnalysis.wordChunks]] semantics, so batch and stream cut
    * text identically). */
  def verdicts(docs: DataFrame, idCol: String, textCol: String, n: Int,
               stateTtlMs: Option[Long] = None): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[Keeper]
    implicit val outEnc = Encoders.product[Verdict]

    // Guards match the batch twin (Curation.chunkDedupRebuild): the
    // packed long admits only idx < 100000 and a non-negative integral
    // doc id — a silent overflow or null-cast id would emit corrupted
    // verdicts instead of failing loudly, breaking the documented
    // stream==batch parity.
    val longId = col(idCol).cast("long")
    val guardedId = when(longId.isNotNull && longId >= 0L, longId)
      .otherwise(raise_error(lit(
        "StreamingChunkDedup: doc id must be a non-negative integral"))
        .cast("long"))
    val guardedPos = when(col("pos") < 100000, col("pos").cast("long"))
      .otherwise(raise_error(lit(
        "StreamingChunkDedup: chunk index overflows the keep-first packing"))
        .cast("long"))
    val keyed = docs
      .select(guardedId.as("doc_id"),
        posexplode(TextAnalysis.wordChunks(col(textCol), n)))
      .select((col("doc_id") * 100000L + guardedPos).as("packed"),
        md5(col("col")).as("h"))
      .as[Chunk]

    def fn(h: String, batch: Iterator[Chunk],
           state: GroupState[Keeper]): Iterator[Verdict] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = batch.toSeq.sortBy(_.packed)
        var keeper = state.getOption.map(_.keeper).getOrElse(-1L)
        val out = sorted.map { c =>
          if (keeper < 0L) keeper = c.packed
          Verdict(c.packed / 100000L, (c.packed % 100000L).toInt,
            keeper, c.packed != keeper)
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
