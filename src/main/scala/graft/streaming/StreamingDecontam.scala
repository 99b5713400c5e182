package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming BENCHMARK-DECONTAMINATION screen — the live counterpart
  * of the batch q199 query: documents arriving in micro-batches are
  * screened at crawl time against a FIXED benchmark set's LSH band
  * index, so contaminated training docs are flagged before they are
  * ever written to the corpus (instead of being hunted down in a
  * yearly batch audit).
  *
  * Composition is deliberately the cheapest streaming shape there is:
  *  1. [[Dedup.lshBandKeysNarrow]] computes each arriving doc's band
  *     keys as per-row array expressions — map-side, no aggregation,
  *     append-mode-legal (the same property [[StreamingNearDup]]
  *     exploits).
  *  2. A STREAM-STATIC equi-join on the 16-byte band key against the
  *     pre-built benchmark index. The static side is loaded once per
  *     micro-batch planner cycle and is benchmark-sized (thousands of
  *     rows), so Spark broadcasts it — the stream side never
  *     shuffles.
  *  3. `dropDuplicates` collapses multi-band collisions of the same
  *     (doc, bench) pair — the only stateful operator, holding one
  *     entry per distinct emitted hit (hit-proportional, not
  *     corpus-proportional; contamination hits are rare by
  *     construction).
  *
  * Band-key computation is per-document and deterministic, so the
  * stream's collision set provably equals the batch screen's: banding
  * train and bench together (q199) and banding each side separately
  * then joining produce the SAME cross-set pairs. The spec pins this
  * stream==batch parity against [[Dedup.incrementalCandidatePairs]].
  *
  * 100 TB posture: the benchmark index is static and tiny next to the
  * crawl; the stream side is one codegen'd projection per doc; no
  * text, signature, or shingle ever enters an exchange. Exact-Jaccard
  * confirmation of flagged hits belongs downstream on the (rare) hit
  * stream — the batch relational kernel (q172/q199's shape) applies
  * unchanged to a foreachBatch sink.
  */
object StreamingDecontam {

  /** Pre-built benchmark band index: (bench_id, bk). Build ONCE from
    * the static benchmark frame and persist/broadcast; every
    * micro-batch joins against it. Same n/k/bands scheme as the
    * corpus-side banding so collision semantics match the batch
    * screen. */
  def benchIndex(bench: DataFrame, idCol: String, textCol: String,
                 n: Int = 5, k: Int = 8, bands: Int = 2): DataFrame =
    Dedup.lshBandKeysNarrow(bench, idCol, textCol, n, k, bands)
      .select(col(idCol).as("bench_id"), col("bk"))

  /** Distinct (doc_id, bench_id) contamination candidates for a
    * streaming `docs` frame — every arriving doc that shares at least
    * one LSH band with a benchmark doc emits one hit row. Append-only;
    * works identically on a batch frame (the parity the spec pins). */
  def hits(docs: DataFrame, idCol: String, textCol: String,
           benchIdx: DataFrame, n: Int = 5, k: Int = 8,
           bands: Int = 2): DataFrame =
    Dedup.lshBandKeysNarrow(docs, idCol, textCol, n, k, bands)
      .join(broadcast(benchIdx), "bk")
      .select(col(idCol).as("doc_id"), col("bench_id"))
      .dropDuplicates("doc_id", "bench_id")
}
