package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * combine a lexical ranking (BM25 over the inverted index) with a
  * semantic ranking (cosine ANN over embeddings) into one hybrid
  * retrieval result without comparing their incommensurable scores:
  * only RANKS cross the boundary,
  *
  *   rrf(doc) = Σ_lists ⌊10⁶ / (K + rank_list(doc))⌋,
  *
  * with the fixed-point division an integer `div` (floors identically
  * in every engine), so the fused score is an exact BIGINT and the
  * result is oracle-checkable.
  *
  * Scale: each input ranking is already a top-N (bounded by its own
  * retrieval's limit), so the fusion operates on |lists|·N rows — the
  * joins here never touch the corpus. The expensive work happened in
  * the per-list retrievals, which keep their own scale stories (BM25
  * reads |terms| pruned index buckets; ANN reads LSH/IVF candidate
  * cells).
  */
object Fusion {

  /** Fuse rankings — each a (doc_id, rank) frame with rank 1-based and
    * dense within its list — into (doc_id, n_lists, rrf_fp), the top
    * `topK` by fused score (ties to the lower doc_id). A document
    * missing from a list simply contributes nothing for it (full outer
    * join + coalesce-to-0), matching the RRF paper's treatment. */
  def rrf(rankings: Seq[DataFrame], rrfK: Int, topK: Int): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("doc_id"),
        expr(s"1000000 div ($rrfK + rank)").as(s"c_$i"))
    }
    val joined = contribs.reduce(
      (a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val total = contribs.indices
      .map(i => coalesce(col(s"c_$i"), lit(0L))).reduce(_ + _)
    val nLists = contribs.indices
      .map(i => when(col(s"c_$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    joined.select(col("doc_id"), nLists.as("n_lists"), total.as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Attach a 1-based dense rank to an ALREADY-BOUNDED result frame
    * (a retrieval top-N): row_number over (ordCol desc, doc_id asc).
    * The global window is intentional and safe — the input is a top-N,
    * so at most N rows pass through the single window partition; never
    * call this on an unbounded frame. */
  def rankOf(topN: DataFrame, ordCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(ordCol).desc, col("doc_id").asc)
    topN.select(col("doc_id"), row_number().over(w).cast("long").as("rank"))
  }
}
