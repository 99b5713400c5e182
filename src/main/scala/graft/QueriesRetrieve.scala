package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Fusion, RandomProjection, Similarity, TextAnalysis, TrainPrep}
import Queries.Q

/** Retrieval-fusion and corpus-geometry queries: hybrid lexical+semantic
  * search, fielded ranking, vocabulary-growth and cross-source overlap
  * censuses, and signed random projection — the layer that combines the
  * index artifacts (q110-q121) with the embedding machinery (q20-q105).
  */
object QueriesRetrieve {

  private val QueryTerms = Seq("query", "window", "scan")

  /** HYBRID RETRIEVAL VIA RRF (Fusion.rrf): the lexical BM25 top-50
    * (q114's engine) and the semantic cosine top-50 for query vector 0
    * (q20's engine) fused by reciprocal rank — only RANKS cross the
    * lexical/semantic boundary, so the incommensurable scores never
    * mix and the fused score is an exact BIGINT
    * (Σ 10⁶ div (60 + rank)). Missing-from-one-list docs keep the
    * other list's contribution (full outer + coalesce). Each input is
    * a bounded top-N; the fusion never touches the corpus. */
  private val q122 = Q(
    "q122_rrf_fusion",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      // BM25 off the stored (postings, doc-lengths) index pair — the
      // q157 read path; bm25Rank(docs, …) re-tokenized the corpus per
      // invocation for identical inputs (termDocs + tokenCount lens)
      val (post, lens) = SharedGrams.postingPair(s, dir)
      val lex = Fusion.rankOf(
        TrainPrep.bm25RankFromPair(post, lens, QueryTerms, 50),
        "score_fp")
      val sem = Similarity.cosineTopKFast(e, e.filter(col("id") === 0), 50)
        .select(col("vec_id").as("doc_id"), col("rnk").cast("long").as("rank"))
      Fusion.rrf(Seq(lex, sem), rrfK = 60, topK = 20)
    },
    Some("""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
      toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      sc AS (
        SELECT p.doc_id,
          CAST(FLOOR(
            (CAST(2*(st.nd - d.df) + 1 AS DOUBLE)
               / CAST(2*d.df + 1 AS DOUBLE))
            * (CAST(22*p.tf*st.tt AS DOUBLE)
               / CAST(10*p.tf*st.tt + 3*st.tt + 9*l.dl*st.nd AS DOUBLE))
            * 1e6) AS BIGINT) AS s
        FROM p JOIN d USING (term)
          JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN st),
      base AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_fp
        FROM sc GROUP BY 1),
      lex AS (SELECT doc_id, rank FROM (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC) AS rank
        FROM base) t WHERE rank <= 50),
      ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      q AS (SELECT * FROM ev WHERE vec_id = 0),
      dots AS (SELECT e.vec_id,
          CAST(SUM(CAST(q.a*e.a AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM q JOIN ev e ON q.i = e.i AND e.vec_id <> 0 GROUP BY 1),
      cos AS (SELECT dots.vec_id, dot / (nq.nrm * ne.nrm) AS cosim
        FROM dots JOIN norms ne ON dots.vec_id = ne.vec_id
        CROSS JOIN (SELECT nrm FROM norms WHERE vec_id = 0) nq),
      sem AS (SELECT vec_id AS doc_id, rank FROM (
        SELECT vec_id,
          ROW_NUMBER() OVER (ORDER BY cosim DESC, vec_id ASC) AS rank
        FROM cos) t WHERE rank <= 50),
      f AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
          (CASE WHEN lex.rank IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN sem.rank IS NOT NULL THEN 1 ELSE 0 END) AS n_lists,
          (COALESCE(1000000 // (60 + lex.rank), 0)
            + COALESCE(1000000 // (60 + sem.rank), 0)) AS rrf_fp
        FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
      SELECT doc_id, CAST(n_lists AS BIGINT) AS n_lists,
        CAST(rrf_fp AS BIGINT) AS rrf_fp
      FROM f ORDER BY rrf_fp DESC, doc_id ASC LIMIT 20"""))

  /** FIELDED BM25 (TrainPrep.bm25FieldedRank): title = first 16 tokens
    * at 3× weight, body = the rest — the BM25F early-tf-merge variant
    * running through q114's exact rational kernel with weighted
    * (tf, dl). One posexplode decides the field per occurrence; the
    * weighted lengths are tokenCount arithmetic with no explode. */
  private val q123 = Q(
    "q123_bm25_fielded",
    (s, dir) =>
      TrainPrep.bm25FieldedRank(Tables.documents(s, dir),
        titleLen = 16, titleBoost = 3, QueryTerms, topK = 20),
    Some("""WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      lens AS (SELECT doc_id,
          3*LEAST(len(ts), 16) + GREATEST(len(ts) - 16, 0) AS dl FROM tk),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
      toks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i, ts[CAST(i AS INT)] AS term
        FROM tk, UNNEST(range(1, len(ts)+1)) AS t(i)),
      p AS (SELECT term, doc_id,
          CAST(SUM(CASE WHEN i <= 16 THEN 3 ELSE 1 END) AS BIGINT) AS tf
        FROM toks WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      sc AS (
        SELECT p.doc_id,
          CAST(FLOOR(
            (CAST(2*(st.nd - d.df) + 1 AS DOUBLE)
               / CAST(2*d.df + 1 AS DOUBLE))
            * (CAST(22*p.tf*st.tt AS DOUBLE)
               / CAST(10*p.tf*st.tt + 3*st.tt + 9*l.dl*st.nd AS DOUBLE))
            * 1e6) AS BIGINT) AS s
        FROM p JOIN d USING (term)
          JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN st)
      SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(s) AS BIGINT) AS score_fp
      FROM sc GROUP BY 1
      ORDER BY score_fp DESC, doc_id ASC LIMIT 20"""))

  /** VOCABULARY GROWTH (Heaps-law census) over the 5-char shingle
    * vocabulary (the dedup family's shingles — the whitespace-token
    * vocabulary of this corpus is a closed 31-word set, so shingles
    * are what actually grow): per 50-document bucket of FIRST
    * APPEARANCE, how many new shingles the bucket introduces, plus the
    * running vocabulary size. The min-doc-per-shingle aggregation is
    * one shingle-keyed shuffle; the running vocab_size is the global
    * prefix sum of the bucket census, computed by the two-phase
    * range-partitioned kernel (WeightedSample.withCumWeight — bucket
    * is a unique key, so the prefix sum in bucket order IS the
    * cumulative vocabulary): per-range-bucket running sums plus
    * broadcast starting offsets, NO single-partition window at any
    * census width. The census is corpus/50 rows — unbounded in corpus
    * size, which is exactly why the kernel (not a global
    * Window.orderBy) must carry it. */
  private val q124 = Q(
    "q124_vocab_growth",
    (s, dir) => {
      // NOT shingleRows: its per-doc DISTINCT is a second full shuffle
      // of the shingle rows that a min-per-shingle aggregation never
      // needs — the raw explode feeds the partial min directly
      val first = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.operators.Dedup.charShingles(col("text"), 5))
            .as("sh"))
        .groupBy(col("sh")).agg(min(col("doc_id")).as("fd"))
      // NO checkpoint before the prefix-sum kernel, despite the
      // r12-noted sampler double-evaluation (withCumWeight's
      // repartitionByRange samples its input, re-running the shingle
      // agg): the r13 A/B measured the pin −24% within a warm JVM but
      // +11..15% drift-adjusted across two cold full benches and 4
      // alternating cold ONLY-mode runs — the checkpoint job's cold
      // cost exceeds the saved (page-cache-hot) second agg at this
      // SF. Revisit only with a cold protocol in hand.
      val census = first.groupBy(expr("fd div 50").as("bucket"))
        .agg(count(lit(1)).as("new_shingles"))
      graft.operators.WeightedSample
        .withCumWeight(census, "bucket", "new_shingles")
        .withColumnRenamed("cum", "vocab_size")
        .orderBy(col("bucket"))
    },
    Some("""WITH sh AS (
        SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
        FROM documents, UNNEST(range(1, greatest(length(text)-4, 1)+1)) AS t(i)),
      f AS (SELECT sh.sh, MIN(doc_id) AS fd FROM sh GROUP BY 1),
      b AS (SELECT fd // 50 AS bucket, COUNT(*) AS new_shingles
        FROM f GROUP BY 1)
      SELECT CAST(bucket AS BIGINT) AS bucket, new_shingles,
        CAST(SUM(new_shingles) OVER (ORDER BY bucket
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
      FROM b ORDER BY bucket"""))

  /** CROSS-SOURCE VOCABULARY OVERLAP: pairwise Jaccard of the distinct
    * -term sets of every source pair — the corpus-composition diagnostic
    * (which crawls duplicate each other's vocabulary). Set sizes and
    * intersections are exact counts over the deduped (source, term)
    * frame; the only join key is the term, so per-term fan-out is
    * bounded by #sources², never by corpus size. Fixed-point Jaccard
    * (10⁶·|∩| div |∪|) keeps the output integer. Top 15 pairs. */
  private val q125 = Q(
    "q125_source_overlap",
    (s, dir) => {
      val st = Tables.documents(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      st.as("a")
        .join(st.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("sz").as("sz_a"))), Seq("src_a"))
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("sz").as("sz_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("inter"),
          expr("1000000 * inter div (sz_a + sz_b - inter)").as("jaccard_fp"))
        .orderBy(col("jaccard_fp").desc, col("src_a").asc, col("src_b").asc)
        .limit(15)
    },
    Some("""WITH st AS (
        SELECT DISTINCT source, term FROM (
          SELECT source, UNNEST(string_split(text, ' ')) AS term
          FROM documents)),
      sizes AS (SELECT source, COUNT(*) AS sz FROM st GROUP BY 1),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
        FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, inter,
        CAST(1000000 * inter // (sa.sz + sb.sz - inter) AS BIGINT)
          AS jaccard_fp
      FROM inter
      JOIN sizes sa ON src_a = sa.source
      JOIN sizes sb ON src_b = sb.source
      ORDER BY jaccard_fp DESC, src_a ASC, src_b ASC LIMIT 15"""))

  /** SIGNED RANDOM PROJECTION (RandomProjection.projectFpInline,
    * 64 → 8 dims): per-output-dim census of the fixed-point projected
    * components. The query runs the MAP-ONLY inline path (sign matrix
    * baked into the expression, no shuffle, no join); the oracle
    * replays the math through the explicit sign-table join — parity
    * between the two physical shapes is additionally spec-asserted. */
  private val q126 = Q(
    "q126_random_projection",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      RandomProjection.projectFpInline(e, dims = 64, outDims = 8)
        .groupBy(col("j"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("proj_fp")).as("sum_fp"),
          min(col("proj_fp")).as("min_fp"), max(col("proj_fp")).as("max_fp"))
        .orderBy(col("j"))
    },
    Some("""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      x AS (SELECT vec_id, i, CAST(FLOOR(a * 1e6) AS BIGINT) AS xfp FROM ev),
      sg AS (SELECT i, j,
          CASE WHEN substr(md5('rp:' || CAST(j AS VARCHAR) || ':'
              || CAST(i AS VARCHAR)), 1, 1)
            IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sign
        FROM UNNEST(range(1, 65)) AS a(i), UNNEST(range(0, 8)) AS b(j)),
      pr AS (SELECT x.vec_id AS id, sg.j,
          CAST(SUM(sg.sign * x.xfp) AS BIGINT) AS proj_fp
        FROM x JOIN sg ON x.i = sg.i GROUP BY 1, 2)
      SELECT CAST(j AS BIGINT) AS j, COUNT(*) AS n_vecs,
        CAST(SUM(proj_fp) AS BIGINT) AS sum_fp,
        MIN(proj_fp) AS min_fp, MAX(proj_fp) AS max_fp
      FROM pr GROUP BY 1 ORDER BY j"""))

  /** MMR DIVERSIFIED RERANK (Fusion.mmrDiversify): the ANN top-10 for
    * query vector 0 reranked for diversity — greedy picks maximize
    * 4·rel_fp + (min fixed-point sqdist to the picked set) div 10⁶,
    * rel_fp the RRF-style 10⁶ div (60 + rank) so every input is an
    * exact BIGINT. The distributed phase is the ANN retrieval; the
    * O(k·N) greedy runs on the collected 10-candidate model state
    * (bounded by construction). The oracle unrolls all five selection
    * rounds (LEAST-folded min distance per round, argmax with the
    * lower-id tiebreak). */
  private val q128 = Q(
    "q128_mmr_rerank",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val sem = Similarity.cosineTopKFast(e, e.filter(col("id") === 0), 10)
        .select(col("vec_id").as("doc_id"),
          expr("1000000 div (60 + rnk)").as("rel_fp"))
      val cands = sem.join(e.select(col("id").as("doc_id"), col("v")),
        Seq("doc_id"))
      Fusion.mmrDiversify(cands, picks = 5, relW = 4L, distDiv = 1000000L)
        .orderBy(col("pick"))
    },
    Some {
      def leastOf(ds: Seq[String]) =
        if (ds.size == 1) ds.head else s"LEAST(${ds.mkString(", ")})"
      // selection round r: candidates joined to the distances toward
      // every already-picked doc, LEAST-folded, argmax(mmr, low id)
      def round(r: Int): String = {
        val joins = (1 until r).map(p =>
          s"JOIN dd d$p ON d$p.b = c.doc_id AND d$p.a = (SELECT doc_id FROM p$p)")
          .mkString(" ")
        val minD = leastOf((1 until r).map(p => s"d$p.d"))
        s"""m$r AS (SELECT c.doc_id, 4*c.rel + ($minD) // 1000000 AS mmr
           FROM cand c $joins),
         p$r AS (SELECT doc_id, mmr FROM m$r
           ORDER BY mmr DESC, doc_id ASC LIMIT 1)"""
      }
      s"""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      q AS (SELECT * FROM ev WHERE vec_id = 0),
      dots AS (SELECT e.vec_id,
          CAST(SUM(CAST(q.a*e.a AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM q JOIN ev e ON q.i = e.i AND e.vec_id <> 0 GROUP BY 1),
      cos AS (SELECT dots.vec_id, dot / (nq.nrm * ne.nrm) AS cosim
        FROM dots JOIN norms ne ON dots.vec_id = ne.vec_id
        CROSS JOIN (SELECT nrm FROM norms WHERE vec_id = 0) nq),
      cand AS (SELECT vec_id AS doc_id, 1000000 // (60 + rank) AS rel
        FROM (SELECT vec_id,
          ROW_NUMBER() OVER (ORDER BY cosim DESC, vec_id ASC) AS rank
        FROM cos) t WHERE rank <= 10),
      cev AS (SELECT ev.vec_id, ev.i, ev.a
        FROM ev JOIN cand ON ev.vec_id = cand.doc_id),
      dd AS (SELECT x.vec_id AS a, y.vec_id AS b,
          CAST(SUM(CAST(FLOOR(((x.a - y.a)*(x.a - y.a)) * 1e10) AS BIGINT))
            AS BIGINT) AS d
        FROM cev x JOIN cev y ON y.i = x.i AND x.vec_id <> y.vec_id
        GROUP BY 1, 2),
      p1 AS (SELECT doc_id, 4*rel AS mmr FROM cand
        ORDER BY rel DESC, doc_id ASC LIMIT 1),
      ${(2 to 5).map(round).mkString(",\n      ")}
      SELECT CAST(pick AS BIGINT) AS pick, doc_id,
        CAST(mmr AS BIGINT) AS mmr_fp
      FROM (
        SELECT 1 AS pick, doc_id, mmr FROM p1
        UNION ALL SELECT 2, doc_id, mmr FROM p2
        UNION ALL SELECT 3, doc_id, mmr FROM p3
        UNION ALL SELECT 4, doc_id, mmr FROM p4
        UNION ALL SELECT 5, doc_id, mmr FROM p5)
      ORDER BY pick"""
    })

  /** CONTRASTIVE PAIR MINING (Similarity.minePairs): for each of 4
    * anchor vectors, the top-3 SAME-label neighbors (positives) and
    * the top-3 DIFFERENT-label neighbors (HARD negatives — the most
    * similar rows that shouldn't be) by exact decimal cosine — the
    * batch-construction primitive for metric learning / embedding
    * finetunes. Broadcast anchors, one linear corpus scan, window
    * partitioned by (anchor, same_label). */
  private val q129 = Q(
    "q129_hard_negatives",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"),
        col("label").cast("long").as("label"))
      Similarity.minePairs(e, e.filter(col("id") < 4), k = 3)
        .select(col("q_id"),
          when(col("same_label"), 1L).otherwise(0L).as("same_label"),
          col("rnk").cast("long").as("rnk"), col("vec_id"))
        .orderBy(col("q_id"), col("same_label"), col("rnk"))
    },
    Some("""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      q AS (SELECT ev.* FROM ev WHERE vec_id < 4),
      dots AS (SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
          CAST(SUM(CAST(q.a*e.a AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM q JOIN ev e ON q.i = e.i AND e.vec_id <> q.vec_id
        GROUP BY 1, 2),
      cos AS (SELECT q_id, dots.vec_id AS vec_id,
          CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS same_label,
          dot / (nq.nrm * nc.nrm) AS cosim
        FROM dots
        JOIN norms nq ON q_id = nq.vec_id
        JOIN norms nc ON dots.vec_id = nc.vec_id
        JOIN embeddings lq ON q_id = lq.vec_id
        JOIN embeddings lc ON dots.vec_id = lc.vec_id),
      rk AS (SELECT q_id, vec_id, same_label,
          ROW_NUMBER() OVER (PARTITION BY q_id, same_label
            ORDER BY cosim DESC, vec_id ASC) AS rnk
        FROM cos)
      SELECT q_id, CAST(same_label AS BIGINT) AS same_label,
        CAST(rnk AS BIGINT) AS rnk, vec_id
      FROM rk WHERE rnk <= 3
      ORDER BY q_id, same_label, rnk"""))

  /** kNN LABEL PROPAGATION (5-NN majority vote): vectors 0-49 are the
    * unlabeled probes, 50+ the labeled pool; each probe takes the
    * majority label of its 5 exact-cosine nearest neighbors (ties to
    * the smaller label), and the output is the (true, predicted)
    * confusion census — the weak-supervision / label-spreading
    * primitive, and a measured quality readout for the embedding
    * space. Probes broadcast; one linear pool scan. */
  private val q130 = Q(
    "q130_knn_labels",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"),
        col("label").cast("long").as("label"))
      val pool = e.filter(col("id") >= 50)
      val probes = e.filter(col("id") < 50)
      val nn = Similarity.cosineTopKFast(
          pool.select(col("id"), col("v")),
          probes.select(col("id"), col("v")), 5)
        .join(pool.select(col("id").as("vec_id"), col("label")), Seq("vec_id"))
      val votes = nn.groupBy(col("q_id"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("n_votes").desc, col("label").asc)
      val pred = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("label").as("pred_label"))
      pred.join(probes.select(col("id").as("q_id"),
          col("label").as("true_label")), Seq("q_id"))
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_label"), col("pred_label"))
    },
    Some("""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      q AS (SELECT * FROM ev WHERE vec_id < 50),
      dots AS (SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
          CAST(SUM(CAST(q.a*e.a AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM q JOIN ev e ON q.i = e.i AND e.vec_id >= 50
        GROUP BY 1, 2),
      cos AS (SELECT q_id, dots.vec_id AS vec_id, dot / (nq.nrm * nc.nrm) AS cosim
        FROM dots
        JOIN norms nq ON q_id = nq.vec_id
        JOIN norms nc ON dots.vec_id = nc.vec_id),
      nn AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
            ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY cosim DESC, vec_id ASC) AS rnk
          FROM cos) t WHERE rnk <= 5),
      votes AS (SELECT nn.q_id, l.label, COUNT(*) AS n_votes
        FROM nn JOIN embeddings l ON nn.vec_id = l.vec_id
        GROUP BY 1, 2),
      pred AS (SELECT q_id, label AS pred_label FROM (
          SELECT q_id, label,
            ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY n_votes DESC, label ASC) AS rn
          FROM votes) t WHERE rn = 1)
      SELECT CAST(t.label AS BIGINT) AS true_label,
        CAST(pred_label AS BIGINT) AS pred_label, COUNT(*) AS n
      FROM pred JOIN embeddings t ON pred.q_id = t.vec_id
      GROUP BY 1, 2 ORDER BY true_label, pred_label"""))

  /** K-CENTER COVERAGE (coreset census): the 4 farthest-first seeds
    * (q115's derandomized traversal — the classic k-center
    * 2-approximation) with each vector assigned to its nearest seed,
    * read out as per-seed population and COVERAGE RADIUS (max
    * fixed-point sqdist) — the data-pruning question "how well do k
    * representatives cover the corpus". Selection is k narrow scans;
    * assignment is one broadcast-literal argmin pass; no data-row
    * shuffle anywhere before the 4-row census. */
  private val q131 = Q(
    "q131_kcenter_coverage",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          Similarity.asDouble(col("embedding")).as("v"))
      val init = graft.operators.KMeansCluster.farthestFirstInit(emb, 4)
      graft.operators.KMeansCluster.lloydFrom(emb, init, iters = 1)
        .groupBy(col("cluster").cast("long").as("cluster"))
        .agg(count(lit(1)).as("n"),
          max(col("dist")).as("radius_fp"),
          sum(col("id")).as("id_sum"))
        .orderBy(col("cluster"))
    },
    Some {
      def dist(cte: String) =
        s"""SELECT e.vec_id, CAST(SUM(CAST(FLOOR(((e.a - c.m)*(e.a - c.m)) * 1e10)
           AS BIGINT)) AS BIGINT) AS d
           FROM ev e JOIN $cte c ON e.i = c.i GROUP BY 1"""
      s"""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      s0 AS (SELECT MIN(vec_id) AS vid FROM embeddings),
      c0 AS (SELECT 0 AS cid, e.i, e.a AS m FROM ev e JOIN s0 ON e.vec_id = s0.vid),
      m1 AS (${dist("c0")}),
      s1 AS (SELECT vec_id FROM m1 ORDER BY d DESC, vec_id LIMIT 1),
      c1 AS (SELECT 1 AS cid, e.i, e.a AS m FROM ev e JOIN s1 ON e.vec_id = s1.vec_id),
      m2r AS (${dist("c1")}),
      m2 AS (SELECT m1.vec_id, LEAST(m1.d, m2r.d) AS d
        FROM m1 JOIN m2r ON m1.vec_id = m2r.vec_id),
      s2 AS (SELECT vec_id FROM m2 ORDER BY d DESC, vec_id LIMIT 1),
      c2 AS (SELECT 2 AS cid, e.i, e.a AS m FROM ev e JOIN s2 ON e.vec_id = s2.vec_id),
      m3r AS (${dist("c2")}),
      m3 AS (SELECT m2.vec_id, LEAST(m2.d, m3r.d) AS d
        FROM m2 JOIN m3r ON m2.vec_id = m3r.vec_id),
      s3 AS (SELECT vec_id FROM m3 ORDER BY d DESC, vec_id LIMIT 1),
      c3 AS (SELECT 3 AS cid, e.i, e.a AS m FROM ev e JOIN s3 ON e.vec_id = s3.vec_id),
      cc AS (SELECT * FROM c0 UNION ALL SELECT * FROM c1
        UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3),
      dd AS (
        SELECT e.vec_id, c.cid, CAST(SUM(CAST(FLOOR(((e.a - c.m)*(e.a - c.m)) * 1e10)
          AS BIGINT)) AS BIGINT) AS d
        FROM ev e JOIN cc c ON e.i = c.i GROUP BY 1, 2),
      aa AS (
        SELECT vec_id, cid, d FROM (
          SELECT vec_id, cid, d,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM dd) r WHERE rn = 1)
      SELECT CAST(cid AS BIGINT) AS cluster, COUNT(*) AS n,
        MAX(d) AS radius_fp, CAST(SUM(vec_id) AS BIGINT) AS id_sum
      FROM aa GROUP BY 1 ORDER BY cluster"""
    })

  /** EPOCH-BUDGETED REPETITION PLAN (the data-constrained-scaling
    * allocation, Muennighoff et al. 2023): given a token budget of
    * half the corpus and an equal share per source, each source
    * repeats up to a 4-epoch cap — allocation = min(share, 4·tokens),
    * epochs (millinats of an epoch, 1000·alloc div tokens) all
    * integer. The whole plan is one per-source aggregation + two
    * broadcast scalars; at 100 TB this is catalog-sized work driving
    * the downstream sampler (q94's mixture weights consume it). */
  private val q132 = Q(
    "q132_epoch_budget",
    (s, dir) => {
      val bySource = Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("tokens"))
      val totals = bySource.agg(
        sum(col("tokens")).as("total"),
        count(lit(1)).as("n_sources"))
      bySource.crossJoin(broadcast(totals))
        .select(col("source"), col("tokens"),
          expr("(total div 2) div n_sources").as("share"))
        .select(col("source"), col("tokens"),
          least(col("share"), col("tokens") * 4).as("alloc_tokens"))
        .withColumn("epochs_x1000",
          expr("1000 * alloc_tokens div tokens"))
        .orderBy(col("source"))
    },
    Some("""WITH bysrc AS (
        SELECT source,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
          COUNT(*) AS n_sources FROM bysrc),
      plan AS (
        SELECT source, tokens,
          LEAST((total // 2) // n_sources, tokens * 4) AS alloc_tokens
        FROM bysrc CROSS JOIN tot)
      SELECT source, tokens, alloc_tokens,
        CAST(1000 * alloc_tokens // tokens AS BIGINT) AS epochs_x1000
      FROM plan ORDER BY source"""))

  /** PROJECTED-LSH BUCKETS: q126's 8-dim signed projection closed into
    * its purpose — an LSH family: bucket = the 8 projection SIGNS
    * packed into an integer (the random-hyperplane hash over the
    * REDUCED space, vs q21's raw first-8-dims signs). Map-only until
    * the bucket census; the census is what sizes a bucketed ANN join.
    * The oracle replays projection + packing through the sign-table
    * join. */
  private val q133 = Q(
    "q133_projected_lsh",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      RandomProjection.packSignBuckets(
          RandomProjection.projectFpInline(e, dims = 64, outDims = 8))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_vec"))
        .orderBy(col("bucket"))
    },
    Some("""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      x AS (SELECT vec_id, i, CAST(FLOOR(a * 1e6) AS BIGINT) AS xfp FROM ev),
      sg AS (SELECT i, j,
          CASE WHEN substr(md5('rp:' || CAST(j AS VARCHAR) || ':'
              || CAST(i AS VARCHAR)), 1, 1)
            IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS sign
        FROM UNNEST(range(1, 65)) AS a(i), UNNEST(range(0, 8)) AS b(j)),
      pr AS (SELECT x.vec_id AS id, sg.j,
          CAST(SUM(sg.sign * x.xfp) AS BIGINT) AS proj_fp
        FROM x JOIN sg ON x.i = sg.i GROUP BY 1, 2),
      bk AS (SELECT id,
          CAST(SUM(CASE WHEN proj_fp >= 0 THEN (1::BIGINT << j)
            ELSE 0 END) AS BIGINT) AS bucket
        FROM pr GROUP BY 1)
      SELECT bucket, COUNT(*) AS n, MIN(id) AS min_vec
      FROM bk GROUP BY 1 ORDER BY bucket"""))

  /** SEARCH-RESULT NEAR-DUP COLLAPSE (SERP dedup): the BM25 top-20
    * with results suppressed when a HIGHER-ranked result is ≥50%
    * 5-shingle-Jaccard similar — the "don't show ten copies of the
    * same page" retrieval post-pass — SemDeDup's keep-first anti-join
    * keyed by RANK instead of id. Shingles are exploded only for the
    * 20-row candidate frame (the corpus is never re-shingled), pairs
    * come from the shingle equi-join, and the verdict is one
    * anti-join; the candidate frame is checkpointed once because
    * three consumers would otherwise re-run the BM25 ranking. */
  private val q134 = Q(
    "q134_serp_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // ranking off the stored posting pair (q157's read path) — the
      // corpus is tokenized once per session, not per invocation
      val (post, lens) = SharedGrams.postingPair(s, dir)
      val cand = Fusion.rankOf(
          TrainPrep.bm25RankFromPair(post, lens, QueryTerms, 20),
          "score_fp")
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .localCheckpoint()
      val sh = graft.operators.Dedup
        .shingleRows(cand, "doc_id", "text", 5)
        .join(cand.select(col("doc_id"), col("rank")), Seq("doc_id"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.rank") < col("b.rank"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("i"))
      val shadowed = inter
        .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
        .filter(col("i").cast("double") /
          (col("sza") + col("szb") - col("i")) >= 0.5)
        .select(col("db").as("doc_id")).distinct()
      cand.join(shadowed.withColumn("dup", lit(true)), Seq("doc_id"), "left")
        .filter(coalesce(col("dup"), lit(false)) === false)
        .select(col("doc_id"), col("rank"))
        .orderBy(col("rank"))
    },
    Some("""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
      toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      sc AS (
        SELECT p.doc_id,
          CAST(FLOOR(
            (CAST(2*(st.nd - d.df) + 1 AS DOUBLE)
               / CAST(2*d.df + 1 AS DOUBLE))
            * (CAST(22*p.tf*st.tt AS DOUBLE)
               / CAST(10*p.tf*st.tt + 3*st.tt + 9*l.dl*st.nd AS DOUBLE))
            * 1e6) AS BIGINT) AS s
        FROM p JOIN d USING (term)
          JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN st),
      base AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_fp
        FROM sc GROUP BY 1),
      cand AS (SELECT doc_id, rank FROM (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC) AS rank
        FROM base) t WHERE rank <= 20),
      csh AS (
        SELECT DISTINCT c.doc_id, c.rank, substr(d.text, i, 5) AS sh
        FROM cand c JOIN documents d ON c.doc_id = d.doc_id,
          UNNEST(range(1, greatest(length(d.text)-4, 1)+1)) AS t(i)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
        FROM csh a JOIN csh b ON a.sh = b.sh AND a.rank < b.rank
        GROUP BY 1, 2),
      shadowed AS (
        SELECT DISTINCT db AS doc_id
        FROM inter
        JOIN sizes sa ON da = sa.doc_id
        JOIN sizes sb ON db = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5)
      SELECT c.doc_id, CAST(c.rank AS BIGINT) AS rank
      FROM cand c LEFT JOIN shadowed s ON c.doc_id = s.doc_id
      WHERE s.doc_id IS NULL
      ORDER BY rank"""))

  /** COHORT RETENTION (events table): users grouped by FIRST-SEEN day,
    * per-cohort count of users active again `day_offset` days later —
    * the classic activation/retention triangle. The (user, day)
    * activity grid is one distinct shuffle, the cohort map one
    * user-keyed agg, and the join is user-co-partitioned; the census
    * is cohorts×offsets rows regardless of event volume. */
  private val q135 = Q(
    "q135_cohort_retention",
    (s, dir) => {
      val activity = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      activity.join(cohort, Seq("user_id"))
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
          datediff(col("day"), col("cohort_day")).cast("long")
            .as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("day_offset"))
    },
    Some("""WITH act AS (
        SELECT DISTINCT user_id,
          CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events),
      coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
      SELECT strftime(coh.cohort_day, '%Y-%m-%d') AS cohort,
        CAST(date_diff('day', coh.cohort_day, act.day) AS BIGINT)
          AS day_offset,
        COUNT(*) AS n_users
      FROM act JOIN coh USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort, day_offset"""))

  /** RFM SEGMENTATION (events table): per-user recency (days since
    * last activity, vs the corpus max day), frequency (event count),
    * monetary (decimal-cast value sum), bucketed by integer division
    * into a 4×4 grid census — the standard audience-segmentation
    * operator. One user-keyed aggregation + one broadcast scalar;
    * the grid is 16 rows at any event volume. */
  private val q136 = Q(
    "q136_rfm_segments",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val maxDay = ev.agg(max(to_date(col("ts"))).as("max_day"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("freq"),
          sum(col("value").cast("decimal(18,2)")).as("mon"))
      perUser.crossJoin(broadcast(maxDay))
        .select(col("user_id"), col("freq"), col("mon"),
          datediff(col("max_day"), col("last_day")).cast("long")
            .as("recency"))
        .groupBy(
          least(col("recency"), lit(3L)).as("r_bucket"),
          least(expr("greatest(freq - 40, 0) div 15"), lit(3L))
            .as("f_bucket"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("mon")).cast("double").as("mon_sum"))
        .orderBy(col("r_bucket"), col("f_bucket"))
    },
    Some("""WITH mx AS (
        SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS max_day
        FROM events),
      pu AS (
        SELECT user_id,
          MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
          COUNT(*) AS freq,
          SUM(CAST(value AS DECIMAL(18,2))) AS mon
        FROM events GROUP BY 1),
      r AS (
        SELECT user_id, freq, mon,
          CAST(date_diff('day', last_day, mx.max_day) AS BIGINT) AS recency
        FROM pu CROSS JOIN mx)
      SELECT LEAST(recency, 3) AS r_bucket,
        LEAST(GREATEST(freq - 40, 0) // 15, 3) AS f_bucket,
        COUNT(*) AS n_users,
        CAST(SUM(mon) AS DOUBLE) AS mon_sum
      FROM r GROUP BY 1, 2 ORDER BY r_bucket, f_bucket"""))

  /** GLOBAL TOP-p% DATA SELECTION (exact, no global sort): keep the
    * top 10% of documents by DSIR score (q118's scorer) using the
    * two-phase range-partitioned prefix scan for the global rank —
    * the way an exact corpus-wide "select the best p percent" runs at
    * 100 TB: a composite sort KEY (inverted zero-padded score ‖
    * doc_id) makes ascending key order equal (score desc, id asc),
    * `withCumWeight` with unit weights turns it into a dense global
    * rank with NO single-task window (per-bucket windows + a 32-row
    * offset collect), and the keep rule is rank ≤ ⌊n/10⌋. Census per
    * source of the kept slice. The oracle spells the same rank with
    * one SQL window. */
  private val q137 = Q(
    "q137_top_p_select",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // the DSIR score column from the session artifact (shared with
      // q118's top-25 — identical model, identical target)
      val scored = SharedDsir.scored(s, dir)
      // the 16-digit zero-padded inversion only orders correctly while
      // the score fits under the bias — a pathological target/corpus
      // ratio must fail loudly, not silently mis-rank (repo convention)
      val inRange = col("avg_weight_fp").between(0L, 999999999999999L)
      val guarded = when(inRange, col("avg_weight_fp"))
        .otherwise(raise_error(concat(
          lit("q137: avg_weight_fp outside the sort-key range: "),
          col("avg_weight_fp").cast("string"))).cast("long"))
      val keyed = scored.select(col("doc_id"), col("avg_weight_fp"),
        concat(
          lpad((lit(1000000000000000L) - guarded).cast("string"), 16, "0"),
          lit("-"), lpad(col("doc_id").cast("string"), 12, "0")).as("k"),
        lit(1L).as("one"))
      // count + withCumWeight both consume this frame; the expensive
      // DSIR scoring behind it is the checkpointed session artifact,
      // so the re-read is a cheap projection, no per-query checkpoint
      val n = keyed.count()
      val keep = math.max(1L, n / 10)
      val kept = graft.operators.WeightedSample
        .withCumWeight(keyed, "k", "one")
        .filter(col("cum") <= keep)
      kept.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("avg_weight_fp")).as("score_sum"),
          min(col("cum")).as("best_rank"))
        .orderBy(col("source"))
    },
    Some("""WITH tr AS (
        SELECT doc_id,
          substr(md5(ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1]),
            1, 2) AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d,
          UNNEST(range(1, len(ts))) AS t(i)),
      src AS (SELECT b, COUNT(*) AS sc FROM tr GROUP BY 1),
      tgtdocs AS (SELECT doc_id FROM documents WHERE text LIKE '%spark%'),
      tgt AS (SELECT tr.b, COUNT(*) AS tc
        FROM tr JOIN tgtdocs USING (doc_id) GROUP BY 1),
      stot AS (SELECT COUNT(*) AS s FROM tr),
      ttot AS (SELECT COUNT(*) AS t FROM tr JOIN tgtdocs USING (doc_id)),
      w AS (
        SELECT src.b,
          CAST(FLOOR(1e6 * (
            CAST((COALESCE(tgt.tc, 0) + 1) * (stot.s + 256) AS DOUBLE)
            / CAST((src.sc + 1) * (ttot.t + 256) AS DOUBLE))) AS BIGINT)
            AS wfp
        FROM src LEFT JOIN tgt ON src.b = tgt.b
          CROSS JOIN stot CROSS JOIN ttot),
      sc2 AS (
        SELECT tr.doc_id, COUNT(*) AS n_grams,
          SUM(COALESCE(w.wfp, 1000000)) AS s
        FROM tr LEFT JOIN w ON tr.b = w.b GROUP BY 1),
      scored AS (
        SELECT doc_id, CAST(s // n_grams AS BIGINT) AS avg_weight_fp
        FROM sc2),
      ranked AS (
        SELECT doc_id, avg_weight_fp,
          ROW_NUMBER() OVER (ORDER BY avg_weight_fp DESC, doc_id ASC)
            AS rnk,
          COUNT(*) OVER () AS n
        FROM scored),
      kept AS (
        SELECT * FROM ranked WHERE rnk <= GREATEST(1, n // 10))
      SELECT d.source, COUNT(*) AS n_kept,
        CAST(SUM(avg_weight_fp) AS BIGINT) AS score_sum,
        CAST(MIN(rnk) AS BIGINT) AS best_rank
      FROM kept JOIN documents d USING (doc_id)
      GROUP BY 1 ORDER BY source"""))

  /** CURRICULUM STAGE ASSIGNMENT: the whole corpus ordered by quality
    * (q23's score, ×10⁶ fixed point; floor of engine-identical doubles
    * — the q160 discipline) and cut into 4 equal-rank stages,
    * easy-to-hard. Rank comes from the q137 kernel — composite
    * inverted-score sort key + the two-phase range-partitioned prefix
    * count (WeightedSample.withCumWeight, unit weights) — so there is
    * NO global window at any size; stage = (rank−1)·4 div n. Census
    * per stage: docs, tokens, score span — the readout a trainer's
    * data loader consumes. */
  private val q166 = Q(
    "q166_curriculum_stages",
    (s, dir) => {
      val scored = Tables.documents(s, dir).select(col("doc_id"),
        floor(TextAnalysis.qualityScore(col("text")) * 1000000)
          .cast("long").as("score_fp"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
      // weights sum to 1 so score_fp ∈ [0, 10⁶]; out-of-range must
      // fail loudly, not silently mis-rank (q137's guard convention)
      val guarded = when(col("score_fp").between(0L, 999999999999999L),
        col("score_fp"))
        .otherwise(raise_error(concat(
          lit("q166: score_fp outside the sort-key range: "),
          col("score_fp").cast("string"))).cast("long"))
      val keyed = scored.select(col("doc_id"), col("score_fp"),
        col("tokens"),
        concat(
          lpad((lit(1000000000000000L) - guarded).cast("string"), 16, "0"),
          lit("-"), lpad(col("doc_id").cast("string"), 12, "0")).as("k"),
        lit(1L).as("one"))
        .localCheckpoint() // count + withCumWeight read one lineage
      val n = keyed.count()
      graft.operators.WeightedSample.withCumWeight(keyed, "k", "one")
        .select(col("score_fp"), col("tokens"),
          expr(s"CAST((cum - 1) * 4 div $n AS BIGINT)").as("stage"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("sum_tokens"),
          min(col("score_fp")).as("min_score_fp"),
          max(col("score_fp")).as("max_score_fp"))
        .orderBy(col("stage"))
    },
    Some {
      val stopList = TextAnalysis.EnStopwords
        .map(w => s"t = '$w'").mkString(" OR ")
      s"""WITH scored AS (
        SELECT doc_id,
          CAST(FLOOR((
            LEAST(1.0, len(string_split(text, ' ')) / 100.0) * 0.5 +
            (len(list_filter(string_split(text, ' '), t -> ($stopList)))
               / len(string_split(text, ' '))) * 0.3 +
            (1.0 - LEAST(1.0,
              len(regexp_extract_all(text, '[.,!?;:]')) / 20.0)) * 0.2
          ) * 1000000) AS BIGINT) AS score_fp,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        FROM documents),
      ranked AS (
        SELECT score_fp, tokens,
          ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id ASC) AS rnk,
          COUNT(*) OVER () AS n
        FROM scored)
      SELECT CAST((rnk - 1) * 4 // n AS BIGINT) AS stage,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        CAST(MIN(score_fp) AS BIGINT) AS min_score_fp,
        CAST(MAX(score_fp) AS BIGINT) AS max_score_fp
      FROM ranked GROUP BY 1 ORDER BY stage"""
    })

  /** The rational BM25 kernel as oracle-SQL text, parameterized on
    * the posting CTE name — q148 needs it twice (feedback pass +
    * expanded pass), q149 once; one definition keeps the three
    * replicas token-identical. Expects CTEs `lens(doc_id, dl)` and
    * `st(nd, tt)` in scope. */
  private def Bm25SqlKernel(p: String, out: String): String =
    s"""$out AS (SELECT $p.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_terms,
        CAST(SUM(CAST(FLOOR(
          (CAST(2*(st.nd - d_$p.df) + 1 AS DOUBLE)
             / CAST(2*d_$p.df + 1 AS DOUBLE))
          * (CAST(22*$p.tf*st.tt AS DOUBLE)
             / CAST(10*$p.tf*st.tt + 3*st.tt + 9*l.dl*st.nd AS DOUBLE))
          * 1e6) AS BIGINT)) AS BIGINT) AS score_fp
      FROM $p JOIN d_$p ON $p.term = d_$p.term
        JOIN lens l ON $p.doc_id = l.doc_id CROSS JOIN st
      GROUP BY 1)"""

  /** PSEUDO-RELEVANCE-FEEDBACK EXPANSION (TrainPrep.prfExpandedRank;
    * the Rocchio/RM3 family): BM25 top-10 feedback docs → every term
    * they contain scored feedback-df × 10⁶ div (corpus-df + 1) → the
    * 5 best non-query terms join the query → re-rank through the
    * SAME kernel via the terms-FRAME variant. Fully relational: the
    * data-dependent expansion never hits the driver (no collect), so
    * the shape survives query-log-scale fan-out. */
  private val q148 = Q(
    "q148_prf_expansion",
    (s, dir) => {
      // SharedGrams.postingPair: ONE checkpointed posting build per
      // session+input serves PRF's four posting consumers and every
      // rerun — per-invocation checkpoints would accumulate in the
      // block manager across bench warmup/timed passes
      val (post, lens) = SharedGrams.postingPair(s, dir)
      TrainPrep.prfExpandedRankFrom(post, lens,
        QueryTerms, fbK = 10, nExpand = 5, topK = 20)
    },
    Some(s"""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
        FROM lens),
      toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      post AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        GROUP BY 1, 2),
      p1 AS (SELECT * FROM post
        WHERE term IN ('query', 'window', 'scan')),
      d_p1 AS (SELECT term, COUNT(*) AS df FROM p1 GROUP BY 1),
      ${Bm25SqlKernel("p1", "b1")},
      fb AS (SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (
            ORDER BY score_fp DESC, doc_id ASC) AS rn FROM b1) t
        WHERE rn <= 10),
      dff AS (SELECT term, COUNT(*) AS dff FROM post
        JOIN fb USING (doc_id) GROUP BY 1),
      dfc AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
      expn AS (SELECT term FROM (
          SELECT dff.term, dff.dff*1000000 // (dfc.df + 1) AS escore
          FROM dff JOIN dfc ON dff.term = dfc.term
          WHERE dff.term NOT IN ('query', 'window', 'scan')) t
        ORDER BY escore DESC, term ASC LIMIT 5),
      qterms AS (SELECT term FROM expn
        UNION
        SELECT UNNEST(['query', 'window', 'scan']) AS term),
      p2 AS (SELECT post.* FROM post JOIN qterms USING (term)),
      d_p2 AS (SELECT term, COUNT(*) AS df FROM p2 GROUP BY 1),
      ${Bm25SqlKernel("p2", "b2")}
      SELECT doc_id, n_terms, score_fp FROM b2
      ORDER BY score_fp DESC, doc_id ASC LIMIT 20"""))

  /** HIT-ANCHORED SNIPPET EXTRACTION (Fusion.snippets): for the BM25
    * top-5, the 10-token window with the most DISTINCT query terms
    * (windows anchored at hit positions — an optimal window always
    * starts at one; ties leftmost). Everything after the top-5
    * semi-join is per-result-doc work. */
  private val q149 = Q(
    "q149_search_snippets",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // ranking off the stored posting pair (q157's read path)
      val (post, lens) = SharedGrams.postingPair(s, dir)
      Fusion.snippets(docs,
        Fusion.rankOf(TrainPrep.bm25RankFromPair(post, lens,
          QueryTerms, 5), "score_fp"),
        QueryTerms, width = 10)
    },
    Some(s"""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
        FROM lens),
      toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p1 AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d_p1 AS (SELECT term, COUNT(*) AS df FROM p1 GROUP BY 1),
      ${Bm25SqlKernel("p1", "b1")},
      top AS (SELECT doc_id, CAST(rn AS BIGINT) AS rank FROM (
          SELECT doc_id, ROW_NUMBER() OVER (
            ORDER BY score_fp DESC, doc_id ASC) AS rn FROM b1) t
        WHERE rn <= 5),
      tk AS (SELECT d.doc_id, top.rank, string_split(d.text, ' ') AS ts
        FROM documents d JOIN top ON d.doc_id = top.doc_id),
      hits AS (SELECT doc_id, rank, CAST(i AS BIGINT) AS p,
          ts[CAST(i AS INT)] AS term
        FROM tk, UNNEST(range(1, len(ts)+1)) AS u(i)
        WHERE ts[CAST(i AS INT)] IN ('query', 'window', 'scan')),
      scored AS (SELECT s.doc_id, s.rank, s.p AS st,
          CAST(COUNT(DISTINCT h.term) AS BIGINT) AS n_hits
        FROM hits s JOIN hits h ON s.doc_id = h.doc_id
          AND h.p BETWEEN s.p AND s.p + 9
        GROUP BY 1, 2, 3),
      best AS (SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY n_hits DESC, st ASC) AS rn2 FROM scored) t
        WHERE rn2 = 1)
      SELECT b.doc_id, b.rank, b.st AS win_start, b.n_hits,
        array_to_string(list_slice(tk.ts,
          CAST(b.st AS INT), CAST(b.st AS INT) + 9), ' ') AS snippet
      FROM best b JOIN tk ON b.doc_id = tk.doc_id
      ORDER BY b.rank"""))

  /** RETRIEVAL EVALUATION HARNESS: score the BM25 top-10 against
    * conjunctive pseudo-qrels (docs containing EVERY query term =
    * relevant) — precision@10, recall@10, and MRR as integer ppm.
    * The lexical complement of q102's ANN recall harness; one census
    * row whatever the corpus size. */
  private val q157 = Q(
    "q157_retrieval_eval",
    (s, dir) => {
      val (post, lens) = SharedGrams.postingPair(s, dir)
      val rel = TrainPrep.indexLookupAndFromPostings(post, QueryTerms)
        .select(col("doc_id")).distinct()
      val ranked = Fusion.rankOf(
        TrainPrep.bm25RankFromPair(post, lens, QueryTerms, 10),
        "score_fp")
      val hits = ranked.join(rel, Seq("doc_id"))
        .agg(count(lit(1)).as("hits10"),
          min(col("rank")).as("first_rank"))
      val nrel = rel.agg(count(lit(1)).as("n_relevant"))
      hits.crossJoin(broadcast(nrel))
        .select(col("n_relevant"), col("hits10"),
          expr("hits10 * 1000000 div 10").as("p10_ppm"),
          when(col("n_relevant") === 0, 0L)
            .otherwise(expr("hits10 * 1000000 div n_relevant"))
            .as("recall_ppm"),
          when(col("hits10") === 0, 0L)
            .otherwise(expr("1000000 div first_rank")).as("mrr_x1e6"))
    },
    Some(s"""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
        FROM lens),
      toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p1 AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d_p1 AS (SELECT term, COUNT(*) AS df FROM p1 GROUP BY 1),
      ${Bm25SqlKernel("p1", "b1")},
      ranked AS (SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY score_fp DESC, doc_id ASC) AS rank
        FROM b1 QUALIFY rank <= 10),
      rel AS (SELECT doc_id FROM p1 GROUP BY 1
        HAVING COUNT(DISTINCT term) = 3),
      h AS (SELECT COUNT(*) AS hits10, MIN(rank) AS first_rank
        FROM ranked JOIN rel USING (doc_id)),
      nr AS (SELECT COUNT(*) AS n_relevant FROM rel)
      SELECT CAST(n_relevant AS BIGINT) AS n_relevant,
        CAST(hits10 AS BIGINT) AS hits10,
        CAST(hits10 * 1000000 // 10 AS BIGINT) AS p10_ppm,
        CAST(CASE WHEN n_relevant = 0 THEN 0
          ELSE hits10 * 1000000 // n_relevant END AS BIGINT)
          AS recall_ppm,
        CAST(CASE WHEN hits10 = 0 THEN 0
          ELSE 1000000 // first_rank END AS BIGINT) AS mrr_x1e6
      FROM h CROSS JOIN nr"""))

  /** CASCADE RERANKING: the classic two-stage retrieval — cheap
    * lexical BM25 narrows the corpus to 100 candidates, the exact
    * decimal cosine kernel (q20's engine) reranks ONLY those to a
    * top-10. The candidate restriction is a broadcast semi-join, so
    * the expensive stage never sees the corpus. */
  private val q158 = Q(
    "q158_cascade_rerank",
    (s, dir) => {
      val (post, lens) = SharedGrams.postingPair(s, dir)
      val lexTop = Fusion.rankOf(
        TrainPrep.bm25RankFromPair(post, lens, QueryTerms, 100),
        "score_fp")
      val e = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val cand = e.join(
        broadcast(lexTop.select(col("doc_id").as("id"))),
        Seq("id"), "left_semi")
      Similarity.cosineTopKFast(cand, e.filter(col("id") === 0), 10)
        .select(col("vec_id").as("doc_id"),
          col("rnk").cast("long").as("sem_rank"))
        .join(lexTop.withColumnRenamed("rank", "lex_rank"),
          Seq("doc_id"))
        .select(col("doc_id"), col("lex_rank"), col("sem_rank"))
        .orderBy(col("sem_rank"))
    },
    Some(s"""WITH lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
        FROM lens),
      toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p1 AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks
        WHERE term IN ('query', 'window', 'scan') GROUP BY 1, 2),
      d_p1 AS (SELECT term, COUNT(*) AS df FROM p1 GROUP BY 1),
      ${Bm25SqlKernel("p1", "b1")},
      lex AS (SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY score_fp DESC, doc_id ASC) AS lex_rank
        FROM b1 QUALIFY lex_rank <= 100),
      cev AS (
        SELECT e.vec_id, t.i,
          CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) AS a
        FROM embeddings e JOIN lex ON e.vec_id = lex.doc_id,
          UNNEST(range(1, len(e.embedding)+1)) AS t(i)
        WHERE e.vec_id <> 0),
      qev AS (SELECT vec_id, i,
          CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)
        WHERE vec_id = 0),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM cev GROUP BY 1),
      nq AS (SELECT SQRT(CAST(SUM(CAST(a*a AS DECIMAL(18,16)))
          AS DOUBLE)) AS nrm FROM qev),
      dots AS (SELECT c.vec_id,
          CAST(SUM(CAST(q.a*c.a AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM qev q JOIN cev c ON q.i = c.i GROUP BY 1),
      cos AS (SELECT dots.vec_id,
          dot / (nq.nrm * ne.nrm) AS cosim
        FROM dots JOIN norms ne ON dots.vec_id = ne.vec_id
        CROSS JOIN nq),
      sem AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
          ORDER BY cosim DESC, vec_id ASC) AS sem_rank
        FROM cos QUALIFY sem_rank <= 10)
      SELECT sem.doc_id, CAST(lex.lex_rank AS BIGINT) AS lex_rank,
        CAST(sem.sem_rank AS BIGINT) AS sem_rank
      FROM sem JOIN lex ON sem.doc_id = lex.doc_id
      ORDER BY sem_rank"""))

  val list: Seq[Q] = Seq(q122, q123, q124, q125, q126, q128, q129, q130,
    q131, q132, q133, q134, q135, q136, q137, q148, q149, q157, q158,
    q166)
}
