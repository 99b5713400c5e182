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

  /** Maximal-marginal-relevance diversified rerank (Carbonell &
    * Goldstein 1998) over a BOUNDED candidate frame — the step between
    * "top-N most relevant" and "top-k most relevant AND mutually
    * diverse" (few-shot example selection, dedup-aware retrieval).
    * Greedy: the first pick is the most relevant candidate; each next
    * pick maximizes
    *
    *   mmr = relW·rel_fp + (min sqdist to the picked set) div distDiv
    *
    * (ties to the lower doc_id), with the distance the fixed-point
    * Σ⌊(xᵢ−yᵢ)²·10¹⁰⌋ BIGINT the k-means/SemDedup family uses — the
    * whole objective is exact integer arithmetic, so the greedy chain
    * has an exact unrolled-CTE SQL twin. The first pick's recorded
    * mmr_fp is relW·rel_fp (no diversity term exists yet).
    *
    * `cands` needs (doc_id, rel_fp, v: array<double>) and MUST be
    * bounded (a retrieval top-N): the candidates are collected and the
    * O(picks·N) greedy runs driver-side — at ≤ N ≈ 10³ candidates
    * this is model-state work, exactly like the BPE merge loop; the
    * distributed phase is the retrieval that produced the candidates.
    * A >4096-row frame fails loudly rather than pretending to scale. */
  def mmrDiversify(cands: DataFrame, picks: Int, relW: Long,
                   distDiv: Long): DataFrame = {
    require(picks >= 1 && relW >= 1 && distDiv >= 1)
    // limit BEFORE collect: the guard must fire as an exception on an
    // unbounded frame, not as a driver OOM inside collect()
    val rows = cands.select(col("doc_id").cast("long"),
        col("rel_fp").cast("long"), col("v").cast("array<double>"))
      .limit(4097).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    require(rows.length <= 4096,
      "mmrDiversify reranks bounded top-Ns; got > 4096 candidates")
    def sqDistFp(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) {
        val d = a(i) - b(i); s += math.floor(d * d * 1e10).toLong; i += 1
      }
      s
    }
    val remaining = scala.collection.mutable.LinkedHashMap(
      rows.sortBy(_._1).map(r => r._1 -> r): _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val minDist = scala.collection.mutable.Map.empty[Long, Long]
    var round = 1
    while (round <= math.min(picks, rows.length)) {
      val best = remaining.values.maxBy { case (id, rel, _) =>
        val div = if (round == 1) 0L else minDist(id) / distDiv
        (relW * rel + div, -id) // ties resolve to the LOWER doc_id
      }
      val mmr = relW * best._2 +
        (if (round == 1) 0L else minDist(best._1) / distDiv)
      picked += ((round.toLong, best._1, mmr))
      remaining.remove(best._1)
      remaining.values.foreach { case (id, _, v) =>
        val d = sqDistFp(v, best._3)
        minDist(id) = math.min(minDist.getOrElse(id, Long.MaxValue), d)
      }
      round += 1
    }
    val spark = cands.sparkSession
    import spark.implicits._
    picked.toSeq.toDF("pick", "doc_id", "mmr_fp")
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

  /** Hit-anchored snippet extraction for a ranked result page: for
    * each (doc_id, rank) in `ranked` (a BOUNDED top-N), the
    * `width`-token window containing the most DISTINCT query terms —
    * windows are anchored at query-term occurrences (an optimal
    * window always starts at one: shifting a hit-free left edge right
    * loses nothing), ties break leftmost. Output (doc_id, rank,
    * win_start (1-based), n_hits, snippet).
    *
    * Cost: everything after the semi-join touches only the N result
    * docs — positions explode per doc, candidate starts are hit
    * positions, the start×hit join is per-doc and ≤ len² on a single
    * doc. The corpus never re-scans. */
  def snippets(docs: DataFrame, ranked: DataFrame, terms: Seq[String],
               width: Int): DataFrame = {
    // ONE corpus pass: the semi-join result (≤N rows, text included)
    // is materialized and serves both the hit extraction and the final
    // snippet slice — without the checkpoint the text re-join at the
    // end would re-scan the corpus for N rows of output
    val cand = docs
      .join(broadcast(ranked.select(col("doc_id"), col("rank"))),
        Seq("doc_id"))
      .select(col("doc_id"), col("rank"), col("text"))
      .localCheckpoint()
    val hits = cand
      .select(col("doc_id"), col("rank"),
        posexplode(split(col("text"), " ")))
      .filter(col("col").isin(terms: _*))
      .select(col("doc_id"), col("rank"), (col("pos") + 1).as("p"),
        col("col").as("term"))
    val starts = hits.select(col("doc_id"), col("rank"), col("p").as("st"))
    val scored = starts.join(
        hits.select(col("doc_id"), col("p"), col("term")), Seq("doc_id"))
      .filter(col("p") >= col("st") && col("p") <= col("st") + (width - 1))
      .groupBy(col("doc_id"), col("rank"), col("st"))
      .agg(countDistinct(col("term")).as("n_hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("n_hits").desc, col("st").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(cand.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("rank"), col("st").as("win_start"),
        col("n_hits"),
        array_join(slice(split(col("text"), " "),
          col("win_start").cast("int"), lit(width)), " ").as("snippet"))
      .orderBy(col("rank"))
  }
}
