package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{NgramLm, Similarity}
import Queries.Q

/** Corpus-scoring queries: benchmark-contamination screening in embedding
  * space and language-model quality scoring — the two filters a training
  * -data pipeline runs right before mixing (after dedup, before packing).
  */
object QueriesScore {

  /** The oracle's 8-bit sign-bucket expression (q91's formulation —
    * bit i set iff embedding[i+1] >= 0). */
  private def signBucketSql(col: String): String =
    (0 until 8).map { i =>
      s"(CASE WHEN $col[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  /** EMBEDDING-SPACE CONTAMINATION SCREEN: which corpus vectors are
    * near-duplicates (cosine ≥ 0.3) of ANY benchmark vector? The
    * semantic twin of q50's n-gram decontamination — n-grams catch
    * verbatim leaks, embeddings catch paraphrased ones.
    *
    * Spark side is [[Similarity.crossSetNearPairs]]: multi-probe
    * sign-LSH candidates (benchmark probes its own bucket + every
    * Hamming-1 neighbor — the probe explosion stays on the SMALL side),
    * codegen'd double prefilter, exact decimal confirm. The corpus is
    * never cross-joined and never re-bucketed per probe; at 100 TB the
    * corpus side is one narrow bucket computation + an equi-join.
    * Oracle spells the identical probe set with xor() and confirms with
    * the same decimal kernel. Benchmark = vec_id % 25 (a held-out
    * eval-set stand-in). */
  private val q100 = Q(
    "q100_embedding_contamination",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          Similarity.asDouble(col("embedding")).as("v"))
      val bench = emb.filter(col("id") % 25 === 0)
      val corpus = emb.filter(col("id") % 25 =!= 0)
      Similarity.crossSetNearPairs(corpus, bench, bits = 8, threshold = 0.3)
        .orderBy(col("vec_id"), col("bench_id"))
    },
    Some(s"""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      meta AS (SELECT vec_id, ${signBucketSql("embedding")} AS b
        FROM embeddings),
      norms AS (
        SELECT vec_id,
          SQRT(CAST(SUM(CAST(x*x AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      probes AS (
        SELECT m.vec_id AS bench_id, xor(m.b, f.flip) AS pb
        FROM meta m,
          (SELECT UNNEST([0,1,2,4,8,16,32,64,128]) AS flip) f
        WHERE m.vec_id % 25 = 0),
      cand AS (
        SELECT c.vec_id, p.bench_id
        FROM meta c JOIN probes p ON c.b = p.pb
        WHERE c.vec_id % 25 <> 0),
      dots AS (
        SELECT c.vec_id, c.bench_id,
          CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM cand c
        JOIN ev ea ON ea.vec_id = c.vec_id
        JOIN ev eb ON eb.vec_id = c.bench_id AND eb.i = ea.i
        GROUP BY 1, 2)
      SELECT d.vec_id, d.bench_id
      FROM dots d
      JOIN norms na ON na.vec_id = d.vec_id
      JOIN norms nb ON nb.vec_id = d.bench_id
      WHERE d.dot / (na.nrm * nb.nrm) >= 0.3
      ORDER BY d.vec_id, d.bench_id"""))

  /** BIGRAM-LM QUALITY SCORE (stupid backoff, CCNet-style perplexity
    * proxy): train unigram/bigram counts on the WHOLE corpus, score a
    * document slice by the integer mean of its per-transition scores
    * — all-integer arithmetic ([[NgramLm]]), so the result is
    * hash-exact across engines with no decimal gymnastics. Training is
    * two token-keyed hash aggs (partial agg absorbs hot words before
    * the shuffle); scoring is token-keyed equi-joins + one bounded
    * per-doc window. */
  private val q101 = Q(
    "q101_lm_score",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      NgramLm.score(docs.filter(col("doc_id") % 20 === 0), docs)
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          UNNEST(range(1, len(string_split(text,' '))+1)) AS pos,
          UNNEST(string_split(text,' ')) AS w
        FROM documents),
      tr0 AS (
        SELECT doc_id, LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
        FROM toks),
      tr AS (SELECT * FROM tr0 WHERE prev IS NOT NULL),
      ug AS (SELECT w, COUNT(*) AS c1 FROM toks GROUP BY 1),
      bg AS (SELECT prev, w, COUNT(*) AS c2 FROM tr GROUP BY 1, 2),
      tot AS (SELECT COUNT(*) AS t_total FROM toks),
      s AS (
        SELECT t.doc_id,
          CASE WHEN b.c2 IS NOT NULL THEN (1000000 * b.c2) // up.c1
               ELSE (400000 * COALESCE(uw.c1, 0)) // tt.t_total END AS s
        FROM tr t
        LEFT JOIN bg b ON b.prev = t.prev AND b.w = t.w
        LEFT JOIN ug up ON up.w = t.prev
        LEFT JOIN ug uw ON uw.w = t.w
        CROSS JOIN tot tt
        WHERE t.doc_id % 20 = 0)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        CAST(SUM(s) // COUNT(*) AS BIGINT) AS lm_score
      FROM s GROUP BY 1 ORDER BY doc_id"""))

  /** ANN RECALL@K EVAL ([[Similarity.annRecall]]): score the
    * multi-probe sign-LSH candidate set against the exact decimal
    * top-10 — the gauge that decides when an approximate index may
    * replace brute force. Exact side is the (small) query set × corpus
    * broadcast top-k; candidate side is the bucket equi-join; the
    * readout joins on the (q_id, vec_id) pair key and aggregates per
    * query — every leg scales the way its source operator does, the
    * eval itself adds one pair-keyed join. Integer permille recall
    * keeps it hash-exact. */
  private val q102 = Q(
    "q102_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          Similarity.asDouble(col("embedding")).as("v"))
      val queries = emb.filter(col("id") % 50 === 0)
      val corpus = emb.filter(col("id") % 50 =!= 0)
      val exact = Similarity.cosineTopKFast(corpus, queries, k = 10)
      val cand = Similarity.multiProbeCandidates(corpus, queries, bits = 8)
      Similarity.annRecall(exact, cand, k = 10)
        .orderBy(col("q_id"))
    },
    Some(s"""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      meta AS (SELECT vec_id, ${signBucketSql("embedding")} AS b
        FROM embeddings),
      norms AS (SELECT vec_id,
          SQRT(CAST(SUM(CAST(x*x AS DECIMAL(18,16))) AS DOUBLE)) AS nrm
        FROM ev GROUP BY 1),
      dots AS (
        SELECT qq.vec_id AS q_id, cc.vec_id,
          CAST(SUM(CAST(ea.x * eb.x AS DECIMAL(18,16))) AS DOUBLE) AS dot
        FROM (SELECT vec_id FROM embeddings WHERE vec_id % 50 <> 0) cc
        CROSS JOIN (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0) qq
        JOIN ev ea ON ea.vec_id = cc.vec_id
        JOIN ev eb ON eb.vec_id = qq.vec_id AND eb.i = ea.i
        GROUP BY 1, 2),
      ranked AS (
        SELECT d.q_id, d.vec_id,
          ROW_NUMBER() OVER (PARTITION BY d.q_id
            ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.vec_id) AS rnk
        FROM dots d
        JOIN norms na ON na.vec_id = d.vec_id
        JOIN norms nb ON nb.vec_id = d.q_id),
      topk AS (SELECT q_id, vec_id FROM ranked WHERE rnk <= 10),
      probes AS (
        SELECT m.vec_id AS q_id, xor(m.b, f.flip) AS pb
        FROM meta m,
          (SELECT UNNEST([0,1,2,4,8,16,32,64,128]) AS flip) f
        WHERE m.vec_id % 50 = 0),
      cand AS (
        SELECT DISTINCT c.vec_id, p.q_id
        FROM meta c JOIN probes p ON c.b = p.pb
        WHERE c.vec_id % 50 <> 0),
      h AS (
        SELECT t.q_id, CAST(COUNT(c.vec_id) AS BIGINT) AS hits
        FROM topk t
        LEFT JOIN cand c ON c.q_id = t.q_id AND c.vec_id = t.vec_id
        GROUP BY 1)
      SELECT q_id, hits, (1000 * hits) // 10 AS recall_permille
      FROM h ORDER BY q_id"""))

  /** CCNET HEAD/MIDDLE/TAIL BUCKETS: score every document under the
    * corpus-trained LM (q101's operator, unfiltered), then tercile the
    * corpus by score — CCNet's signature move (head = most
    * in-distribution, tail = candidate garbage), with per-bucket
    * census stats. The exact NTILE needs a total order (score desc,
    * doc_id) — but NOT a single-partition window: the global rank
    * comes from the q166 shape (composite inverted-score sort key
    * through [[graft.operators.WeightedSample.withCumWeight]]'s
    * two-phase range-partitioned prefix count, unit weights), and the
    * tercile is re-derived from (rank, n) in pure integer arithmetic
    * matching NTILE's first-(n mod 3)-tiles-get-the-extra-row rule —
    * same buckets, same hash, zero single-partition stages at any
    * scale. Integer min/max/avg keep the readout hash-exact. */
  private val q103 = Q(
    "q103_ccnet_buckets",
    (s, dir) => {
      // the LM score column from the session artifact (shared with
      // the approximate-buckets twin; the scoring pass dominated)
      val scored = SharedLm.scored(s, dir)
      // lm_score is a non-negative integer ≤ 10⁶ by construction;
      // out-of-range must fail loudly, not silently mis-rank (the
      // q137/q166 sort-key guard convention)
      val guarded = when(col("lm_score").between(0L, 999999999999999L),
        col("lm_score"))
        .otherwise(raise_error(concat(
          lit("q103: lm_score outside the sort-key range: "),
          col("lm_score").cast("string"))).cast("long"))
      val keyed = scored.select(col("lm_score"),
        concat(
          lpad((lit(1000000000000000L) - guarded).cast("string"), 16, "0"),
          lit("-"), lpad(col("doc_id").cast("string"), 12, "0")).as("k"),
        lit(1L).as("one"))
      // count + withCumWeight both consume this frame; the expensive
      // LM scoring behind it is the checkpointed session artifact, so
      // the re-read is a cheap projection, no per-query checkpoint
      val n = keyed.count()
      val tile = n / 3
      val rem = n % 3
      val cut = rem * (tile + 1) // last rank of the oversized tiles
      // NTILE(3) from the exact rank: ranks 1..cut fall in the first
      // `rem` tiles of size tile+1; the rest in tiles of size `tile`
      // (never evaluated when tile = 0 — CASE short-circuits)
      val bucket = expr(
        s"""CAST(CASE WHEN cum <= $cut THEN (cum - 1) div ${tile + 1} + 1
            ELSE $rem + (cum - $cut - 1) div ${math.max(tile, 1L)} + 1
            END AS INT)""").as("bucket")
      graft.operators.WeightedSample.withCumWeight(keyed, "k", "one")
        .select(col("lm_score"), bucket)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("lm_score")).as("min_score"),
          max(col("lm_score")).as("max_score"),
          expr("sum(lm_score) div count(1)").as("avg_score"))
        .orderBy(col("bucket"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          UNNEST(range(1, len(string_split(text,' '))+1)) AS pos,
          UNNEST(string_split(text,' ')) AS w
        FROM documents),
      tr0 AS (
        SELECT doc_id, LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, w
        FROM toks),
      tr AS (SELECT * FROM tr0 WHERE prev IS NOT NULL),
      ug AS (SELECT w, COUNT(*) AS c1 FROM toks GROUP BY 1),
      bg AS (SELECT prev, w, COUNT(*) AS c2 FROM tr GROUP BY 1, 2),
      tot AS (SELECT COUNT(*) AS t_total FROM toks),
      s AS (
        SELECT t.doc_id,
          CASE WHEN b.c2 IS NOT NULL THEN (1000000 * b.c2) // up.c1
               ELSE (400000 * COALESCE(uw.c1, 0)) // tt.t_total END AS s
        FROM tr t
        LEFT JOIN bg b ON b.prev = t.prev AND b.w = t.w
        LEFT JOIN ug up ON up.w = t.prev
        LEFT JOIN ug uw ON uw.w = t.w
        CROSS JOIN tot tt),
      scored AS (
        SELECT doc_id, CAST(SUM(s) // COUNT(*) AS BIGINT) AS lm_score
        FROM s GROUP BY 1),
      bucketed AS (
        SELECT doc_id, lm_score,
          NTILE(3) OVER (ORDER BY lm_score DESC, doc_id) AS bucket
        FROM scored)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        MIN(lm_score) AS min_score, MAX(lm_score) AS max_score,
        CAST(SUM(lm_score) // COUNT(*) AS BIGINT) AS avg_score
      FROM bucketed GROUP BY 1 ORDER BY bucket"""))

  /** The PRODUCTION tercile cut (q35/q73's plan-guarded approx-twin
    * pattern, closing the r8-verdict "documented, not implemented"
    * note): two t-digest thresholds + ONE broadcast + a narrow
    * bucket-assignment filter — no rank at all, not even the two-phase
    * kernel the exact q103 rides. At 100 TB this is the shape a CCNet
    * pipeline ships: the sketch is mergeable executor state, the
    * threshold frame is 1 row, and the scoring scan is read once for
    * thresholds (sketch agg) and once for assignment. Approximation
    * contract: bucket boundaries land on sketch quantiles, so bucket
    * SIZES drift by the t-digest error plus score-tie mass (ties all
    * fall on one side of a threshold, where exact NTILE splits them);
    * CcnetApproxSpec bounds that drift against the exact twin and
    * pins the plan window-free. */
  private[graft] def ccnetBucketsApprox(s: SparkSession,
                                        dir: String): DataFrame = {
    import graft.operators.QuantileSketch
    // thresholds + assignment read the checkpointed session artifact
    val scored = SharedLm.scored(s, dir)
    val th = scored.agg(QuantileSketch.quantiles(
      col("lm_score").cast("double"), Seq(1.0 / 3, 2.0 / 3), 100).as("qs"))
    scored.crossJoin(broadcast(th))
      .select(col("lm_score"),
        when(col("lm_score").cast("double") > element_at(col("qs"), 2),
          lit(1))
          .when(col("lm_score").cast("double") > element_at(col("qs"), 1),
            lit(2))
          .otherwise(lit(3)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("lm_score")).as("min_score"),
        max(col("lm_score")).as("max_score"),
        expr("sum(lm_score) div count(1)").as("avg_score"))
      .orderBy(col("bucket"))
  }

  /** QUALITY-AWARE DEDUP RETENTION: q44 keeps each LSH cluster's
    * min-id doc; real curation pipelines keep the BEST member — here
    * the longest (RefinedWeb's policy), ties to the smaller id. The
    * argmax must be deterministic AND hash-exact, and Spark's
    * max_by breaks ties arbitrarily — so the (n_chars desc, doc_id
    * asc) preference is packed into ONE integer max:
    * key = n_chars·2⁴⁰ + (2⁴⁰−1−doc_id), decoded after the agg. One
    * shuffle on the component key; the packed max is
    * partial-aggregated map-side like any max. Component map shared
    * via `SharedLsh` (the q17/q40/q44 artifact). */
  private val q104 = Q(
    "q104_longest_retention",
    (s, dir) => {
      val B = 1L << 40
      val docs = Tables.documents(s, dir)
      val comps = SharedLsh.components(s, dir)
      docs.join(comps, Seq("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("members"),
          max(col("n_chars") * lit(B) + (lit(B - 1) - col("doc_id")))
            .as("key"))
        .select(col("component"), col("members"),
          (lit(B - 1) - (col("key") % lit(B))).as("keeper"),
          expr(s"key div ${B}L").as("keeper_chars"))
        .orderBy(col("component"))
    },
    Some {
      // same signature/band/component CTEs as q44's oracle (SharedLsh's
      // parameters: 5-char shingles, 8 minhash slices, 2 bands of 4)
      val mins = (0 until 8)
        .map(j => s"MIN(substr(md5('m${j / 4}' || sh), ${(j % 4) * 8 + 1}, 8)) AS h$j")
        .mkString(", ")
      val b = 1L << 40
      s"""WITH RECURSIVE
      sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
        FROM documents, UNNEST(range(1, greatest(length(text)-4, 1)+1)) AS t(i)),
      sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, md5('0' || h0 || h1 || h2 || h3) AS bk FROM sig
        UNION ALL
        SELECT doc_id, md5('1' || h4 || h5 || h6 || h7) AS bk FROM sig),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      walk(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
      comps AS (SELECT node AS doc_id, MIN(label) AS component
                FROM walk GROUP BY 1),
      packed AS (
        SELECT c.component, COUNT(*) AS members,
          MAX(d.n_chars * $b + ($b - 1 - d.doc_id)) AS key
        FROM comps c JOIN documents d ON d.doc_id = c.doc_id
        GROUP BY 1)
      SELECT component, CAST(members AS BIGINT) AS members,
        CAST($b - 1 - (key % $b) AS BIGINT) AS keeper,
        CAST(key // $b AS BIGINT) AS keeper_chars
      FROM packed ORDER BY component"""
    })

  /** COUNT-MIN SKETCH, relationally ([[graft.operators.CountMin]]):
    * build the (j, pos, cnt) table over the token stream, probe the
    * top-20 vocabulary, read est = min over hash rows next to the true
    * frequency. w deliberately tiny (16) so the sketch's defining
    * behavior — overestimation under collision, never underestimation
    * — is VISIBLE in the oracled output, not just asserted in a spec.
    * All cells are plain md5 column arithmetic (q84's trick), so
    * DuckDB derives the identical sketch and the estimates hash-match. */
  private val q105 = Q(
    "q105_cms_estimate",
    (s, dir) => {
      import graft.operators.{CountMin, TextAnalysis}
      val toks = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val sk = CountMin.build(toks, col("tok"), d = 3, log2w = 4)
      val probes = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("tok").asc).limit(20)
      CountMin.estimate(sk, probes, col("tok"), d = 3, log2w = 4)
        .join(probes, col("item") === col("tok"))
        .select(col("tok"), col("tf"), col("est"),
          (col("est") - col("tf")).as("inflation"))
        .orderBy(col("tf").desc, col("tok").asc)
    },
    Some("""WITH toks AS (
        SELECT UNNEST(string_split(text,' ')) AS tok FROM documents),
      cells AS (
        SELECT js.j,
          CAST(('0x' || substr(md5('cm' || js.j || ':' || tok), 1, 8))
            AS BIGINT) & 15 AS pos
        FROM toks, (SELECT UNNEST([0,1,2]) AS j) js),
      sk AS (SELECT j, pos, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
      probes AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1
        ORDER BY tf DESC, tok ASC LIMIT 20),
      pc AS (
        SELECT p.tok, p.tf, js.j,
          CAST(('0x' || substr(md5('cm' || js.j || ':' || p.tok), 1, 8))
            AS BIGINT) & 15 AS pos
        FROM probes p, (SELECT UNNEST([0,1,2]) AS j) js),
      est AS (
        SELECT pc.tok, CAST(pc.tf AS BIGINT) AS tf,
          CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
        FROM pc LEFT JOIN sk ON sk.j = pc.j AND sk.pos = pc.pos
        GROUP BY 1, 2)
      SELECT tok, tf, est, est - tf AS inflation
      FROM est ORDER BY tf DESC, tok ASC"""))

  val list: Seq[Q] = Seq(q100, q101, q102, q103, q104, q105)
}
