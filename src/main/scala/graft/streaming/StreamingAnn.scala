package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** Incremental multi-probe sign-LSH ANN candidates — the streaming form
  * of the batch [[Similarity.multiProbeCandidates]] (q79): vectors
  * arriving in micro-batches emit candidate pairs against every vector
  * ever seen whose sign bucket is within Hamming distance 1 of the
  * newcomer's — the same borderline-dimension recall-recovery rule as
  * batch multi-probe, evaluated incrementally.
  *
  * Composition (mirrors StreamingNearDup's bucket-hub shape):
  *  1. each vector's bucket id is a narrow per-row expression
  *     ([[Similarity.signBucket]] — no aggregation, append-mode-safe);
  *     the probe set (own bucket + each one-bit flip) explodes the
  *     vector's OWN row ×(bits+1) — the query side explodes, the
  *     corpus side never does, exactly as in batch;
  *  2. flatMapGroupsWithState keyed by bucket id holds the ids whose
  *     HOME bucket this is; every arriving probe row pairs its vector
  *     with the bucket's resident members.
  *
  * Emission contract: the DISTINCT canonical {min,max} pair set equals
  * the batch multi-probe candidate set over the same vectors for ANY
  * slicing of the stream (StreamingAnnSpec proves it, restarts
  * included). Individual pairs may appear more than once (two same-
  * batch vectors at Hamming ≤ 1 discover each other from both sides),
  * the same at-least-once posture as StreamingNearDup's star edges —
  * downstream consumers dedup naturally.
  *
  * 100 TB posture: the shuffle carries (bucket id, vec id, home flag)
  * — never the vectors; state is the member-id list per OCCUPIED
  * bucket (total = one entry per vector, spread across buckets; with
  * bits sized by [[Similarity.bucketBitsFor]] a bucket holds O(1)
  * expected members). `stateTtlMs` bounds the pairing horizon and
  * evicts cold buckets, same trade as StreamingNearDup.
  */
object StreamingAnn {

  final case class Probe(id: Long, pb: Long, home: Boolean)
  final case class Members(ids: Seq[Long])
  final case class Cand(q_id: Long, vec_id: Long)

  /** Candidate pairs, append-only. `vectors` needs (id, v:array<double>);
    * emits (q_id = prober, vec_id = resident). Self-pairs never emitted. */
  def candidates(vectors: DataFrame, bits: Int,
                 stateTtlMs: Option[Long] = None): Dataset[Cand] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[Members]
    implicit val outEnc = Encoders.product[Cand]

    val flips = array((0L +: (0 until bits).map(1L << _)).map(lit): _*)
    val probes = vectors
      .select(col("id"), Similarity.signBucket(col("v"), bits).as("qb"))
      .withColumn("flip", explode(flips))
      .select(col("id"), col("qb").bitwiseXOR(col("flip")).as("pb"),
        (col("flip") === 0L).as("home"))
      .as[Probe]

    def fn(pb: Long, batch: Iterator[Probe],
           state: GroupState[Members]): Iterator[Cand] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val rows = batch.toSeq
        if (rows.isEmpty) Iterator.empty
        else {
          val resident = state.getOption.map(_.ids).getOrElse(Seq.empty)
          // re-deliveries (at-least-once sources) must not re-add a
          // resident: state stays one entry per vector, and probes
          // pair each member once per arrival
          val newHome = rows.filter(_.home).map(_.id).distinct.sorted
            .filterNot(resident.contains)
          val members = resident ++ newHome
          val out = Seq.newBuilder[Cand]
          rows.map(_.id).distinct.foreach { q =>
            members.foreach(m => if (m != q) out += Cand(q, m))
          }
          if (newHome.nonEmpty) state.update(Members(members))
          if (state.exists) stateTtlMs.foreach(state.setTimeoutDuration)
          out.result().iterator
        }
      }
    }

    probes.groupByKey(_.pb)
      .flatMapGroupsWithState(OutputMode.Append,
        stateTtlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
          GroupStateTimeout.ProcessingTimeTimeout))(fn)
  }
}
