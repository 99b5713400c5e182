package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.KmvSketch

/** Streaming twin of the KMV distinct-count sketch (the q181/q191
  * operator family): one sorted array of ≤ k smallest distinct hashes
  * per key as `flatMapGroupsWithState` state — bounded however long
  * the stream runs — folded with the SAME LowestK reduce the batch
  * Aggregator uses, so after any stream prefix the state equals the
  * batch sketch of that prefix exactly (KMV merges are lossless;
  * spec-pinned in StreamingKmvSpec). Update mode: each micro-batch
  * emits the refreshed (fill, k-th minimum, NDV estimate) row per key
  * it touched — the live per-source cardinality dashboard a crawl
  * pipeline watches without ever re-scanning history. */
object StreamingKmv {

  final case class In(key: String, h: Long)
  final case class St(vals: Array[Long])
  final case class SketchRow(key: String, fill: Int, kth: Long,
                             est_ndv: Long)

  /** `rows` carries (keyCol, hashCol: long — e.g. KmvSketch.hash32
    * computed upstream); returns the per-batch sketch readout. */
  def sketches(rows: DataFrame, keyCol: String, hashCol: String,
               k: Int): Dataset[SketchRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[SketchRow]
    val agg = new KmvSketch.LowestK(k)
    val keyed = rows.select(col(keyCol).cast("string").as("key"),
      col(hashCol).cast("long").as("h")).as[In]

    def fn(key: String, batch: Iterator[In],
           state: GroupState[St]): Iterator[SketchRow] = {
      val cur = state.getOption.map(_.vals).getOrElse(agg.zero)
      val next = batch.foldLeft(cur)((b, r) => agg.reduce(b, r.h))
      state.update(St(next))
      val fill = next.length
      val kth = if (fill >= k) next(k - 1) else -1L
      val est =
        if (fill < k) fill.toLong
        else (k - 1).toLong * KmvSketch.HashSpace / kth
      Iterator.single(SketchRow(key, fill, kth, est))
    }

    keyed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }

  final case class StateRow(key: String, kmv: Array[Long])

  /** Same fold, but each micro-batch emits the refreshed SKETCH ARRAY
    * per touched key — the input the set-algebra stage
    * ([[graft.operators.KmvSketch.pairEstimates]]) consumes. Because
    * KMV merges are lossless, the emitted array equals the batch
    * sketch of the full arrived prefix, so pair estimates computed
    * from stream state equal the batch estimates EXACTLY after every
    * micro-batch (StreamingKmvAlgebraSpec) — the live cross-source
    * overlap matrix without re-scanning history. */
  def sketchArrays(rows: DataFrame, keyCol: String, hashCol: String,
                   k: Int): Dataset[StateRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[StateRow]
    val agg = new KmvSketch.LowestK(k)
    val keyed = rows.select(col(keyCol).cast("string").as("key"),
      col(hashCol).cast("long").as("h")).as[In]

    def fn(key: String, batch: Iterator[In],
           state: GroupState[St]): Iterator[StateRow] = {
      val cur = state.getOption.map(_.vals).getOrElse(agg.zero)
      val next = batch.foldLeft(cur)((b, r) => agg.reduce(b, r.h))
      state.update(St(next))
      Iterator.single(StateRow(key, next))
    }

    keyed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
