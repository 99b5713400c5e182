package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeansCluster, Similarity, TrainPrep}
import Queries.Q

/** Last-mile training-set preparation queries (operators/TrainPrep,
  * operators/KMeansCluster): leakage-guarded splits, deterministic
  * token-balanced sharding, distributed k-means, overlap chunking, and
  * inverted-index construction — the steps between a deduped corpus
  * and bytes on training workers.
  */
object QueriesTrain {

  /** LEAKAGE-GUARDED SPLIT (TrainPrep.clusterAwareSplit): documents
    * sharing exact content form one unit keyed by the group's min
    * doc_id; the split hashes the UNIT id, so duplicates can never
    * straddle train/test — the guard q41's per-doc hash lacks. The
    * docid_sum pins the exact per-document assignment. */
  private val q106 = Q(
    "q106_cluster_split",
    (s, dir) =>
      TrainPrep.clusterAwareSplit(Tables.documents(s, dir))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("doc_id")).as("docid_sum"))
        .orderBy(col("split")),
    Some("""WITH u AS (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id
        FROM documents),
      t AS (
        SELECT doc_id, cluster_id,
          CASE substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 1)
            WHEN 'd' THEN 'val' WHEN 'e' THEN 'test' WHEN 'f' THEN 'test'
            ELSE 'train' END AS split
        FROM u)
      SELECT split, COUNT(*) AS n_docs,
        COUNT(DISTINCT cluster_id) AS n_clusters,
        CAST(SUM(doc_id) AS BIGINT) AS docid_sum
      FROM t GROUP BY 1 ORDER BY split"""))

  /** TOKEN-BALANCED SHARDS (TrainPrep.tokenBalancedShards): md5-keyed
    * deterministic shuffle, two-phase range-scan prefix sums (never a
    * single-task global window), shard = start-offset · n / total. The
    * oracle spells the same cumulative line with one SQL window; the
    * per-shard token sums demonstrate the balance property. */
  private val q107 = Q(
    "q107_token_shards",
    (s, dir) =>
      TrainPrep.tokenBalancedShards(Tables.documents(s, dir), 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("shard_tokens"),
          sum(col("doc_id")).as("docid_sum"))
        .orderBy(col("shard")),
    Some("""WITH k AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
          len(string_split(text, ' ')) AS tokens
        FROM documents),
      c AS (
        SELECT doc_id, tokens,
          SUM(tokens) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum,
          SUM(tokens) OVER () AS total
        FROM k)
      SELECT CAST(FLOOR((cum - tokens) * 8 / total) AS BIGINT) AS shard,
        COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS shard_tokens,
        CAST(SUM(doc_id) AS BIGINT) AS docid_sum
      FROM c GROUP BY 1 ORDER BY shard"""))

  /** DISTRIBUTED K-MEANS (KMeansCluster.lloyd, k=4, 2 Lloyd rounds,
    * seeds = vectors 0..3): per-iteration plan is a narrow broadcast
    * -centroid argmin scan plus ONE k·dims-row shuffle for the means —
    * the trainer for the IVF/IVF-PQ centroids used by q47/q48/q95.
    * Fixed-point distance kernel (Σ ⌊(x−m)²·10¹⁰⌋ as BIGINT — pure
    * IEEE + integer ops, no engine-dependent decimal rounding) with a
    * lowest-id tiebreak makes the assignment and inertia exact; the
    * oracle replays both rounds in SQL. */
  private val q108 = Q(
    "q108_kmeans",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          Similarity.asDouble(col("embedding")).as("v"))
      KMeansCluster.lloyd(emb, k = 4, iters = 2)
        .groupBy(col("cluster").cast("long").as("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(col("id")).as("id_sum"),
          sum(col("dist")).as("inertia"))
        .orderBy(col("cluster"))
    },
    Some("""WITH ev AS (
        SELECT vec_id, i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS a
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      c0 AS (SELECT vec_id AS cid, i, a AS m FROM ev WHERE vec_id < 4),
      d1 AS (
        SELECT e.vec_id, c.cid,
          SUM(CAST(FLOOR(((e.a - c.m)*(e.a - c.m)) * 1e10) AS BIGINT)) AS d
        FROM ev e JOIN c0 c ON e.i = c.i GROUP BY 1, 2),
      a1 AS (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d1) r WHERE rn = 1),
      c1 AS (
        SELECT a1.cid, e.i,
          CAST(SUM(CAST(FLOOR(e.a * 1e12) AS BIGINT)) AS DOUBLE)
            / 1e12 / COUNT(*) AS m
        FROM ev e JOIN a1 ON e.vec_id = a1.vec_id GROUP BY 1, 2),
      d2 AS (
        SELECT e.vec_id, c.cid,
          SUM(CAST(FLOOR(((e.a - c.m)*(e.a - c.m)) * 1e10) AS BIGINT)) AS d
        FROM ev e JOIN c1 c ON e.i = c.i GROUP BY 1, 2),
      a2 AS (
        SELECT vec_id, cid, d FROM (
          SELECT vec_id, cid, d,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
          FROM d2) r WHERE rn = 1)
      SELECT CAST(cid AS BIGINT) AS cluster, COUNT(*) AS n,
        CAST(SUM(vec_id) AS BIGINT) AS id_sum,
        CAST(SUM(d) AS BIGINT) AS inertia
      FROM a2 GROUP BY 1 ORDER BY cluster"""))

  /** OVERLAP CHUNKING (TrainPrep.chunks, width 128, step 64): the
    * RAG/context-window fan-out as a pure narrow explode; per-doc
    * chunk census pins every window's extent (count, char mass, last
    * start). */
  private val q109 = Q(
    "q109_chunk_overlap",
    (s, dir) =>
      TrainPrep.chunks(Tables.documents(s, dir), width = 128, step = 64)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(length(col("chunk"))).as("chunk_chars"),
          max(col("start")).cast("long").as("last_start"))
        .orderBy(col("doc_id")),
    Some("""WITH ch AS (
        SELECT doc_id, CAST(s AS INT) AS start,
          substr(text, CAST(s AS INT), 128) AS chunk
        FROM documents, UNNEST(range(1, len(text)+1, 64)) AS t(s)
        WHERE len(text) >= 1)
      SELECT doc_id, COUNT(*) AS n_chunks,
        CAST(SUM(length(chunk)) AS BIGINT) AS chunk_chars,
        CAST(MAX(start) AS BIGINT) AS last_start
      FROM ch GROUP BY 1 ORDER BY doc_id"""))

  /** INVERTED INDEX (TrainPrep.postings): term → document frequency,
    * corpus term frequency, and an md5 digest of the sorted posting
    * list — the digest pins full posting content in a scalar the
    * oracle can recompute. Top 25 terms by df. */
  private val q110 = Q(
    "q110_inverted_index",
    (s, dir) =>
      TrainPrep.postings(Tables.documents(s, dir))
        .orderBy(col("df").desc, col("term").asc)
        .limit(25),
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      p AS (SELECT term, doc_id, COUNT(*) AS tf_doc FROM toks GROUP BY 1, 2)
      SELECT term, COUNT(*) AS df, CAST(SUM(tf_doc) AS BIGINT) AS tf,
        md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
          AS postings_md5
      FROM p GROUP BY 1
      ORDER BY df DESC, term ASC LIMIT 25"""))

  /** CONJUNCTIVE INDEX LOOKUP (TrainPrep.indexLookupAnd): documents
    * containing every query term, with per-term frequencies — the
    * read path of q110's index. The per-term filters sit on the
    * posting aggregation's grouping key, so they push below the agg
    * into the scan; intersection is an equi-join on doc_id, and with
    * a term-bucketed posting table only the queried terms' postings
    * are ever touched. */
  private val q111 = Q(
    "q111_index_lookup",
    (s, dir) =>
      TrainPrep.indexLookupAnd(Tables.documents(s, dir),
          Seq("query", "window", "scan"))
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents),
      t0 AS (SELECT doc_id, COUNT(*) AS tf_0 FROM toks
        WHERE term = 'query' GROUP BY 1),
      t1 AS (SELECT doc_id, COUNT(*) AS tf_1 FROM toks
        WHERE term = 'window' GROUP BY 1),
      t2 AS (SELECT doc_id, COUNT(*) AS tf_2 FROM toks
        WHERE term = 'scan' GROUP BY 1)
      SELECT doc_id, tf_0, tf_1, tf_2
      FROM t0 JOIN t1 USING (doc_id) JOIN t2 USING (doc_id)
      ORDER BY doc_id"""))

  /** PHRASE SEARCH (TrainPrep.phraseSearch): exact token-sequence
    * match via the positional index — per-term posting filters plus
    * (doc_id, pos−offset) equi-joins, the classic positional
    * intersection. The corpus text is never re-scanned per phrase;
    * at scale the posting table is the bucketed artifact this reads. */
  private val q112 = Q(
    "q112_phrase_search",
    (s, dir) =>
      TrainPrep.phraseSearch(Tables.documents(s, dir),
          Seq("window", "join"))
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
          string_split(text, ' ')[CAST(i AS INT)] AS term
        FROM documents,
          UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS t(i)),
      a AS (SELECT doc_id, pos FROM toks WHERE term = 'window'),
      b AS (SELECT doc_id, pos FROM toks WHERE term = 'join')
      SELECT a.doc_id AS doc_id, COUNT(*) AS n_occurrences
      FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1 ORDER BY a.doc_id"""))

  /** NEAR-DUP LEAKAGE-GUARDED SPLIT (TrainPrep.clusterAwareSplitBy ∘
    * SharedLsh.components): q106's guard upgraded from exact-content
    * groups to MinHash-LSH connected components — paraphrased members
    * of one near-dup cluster can never straddle train/test. Docs
    * outside every cluster are their own singleton unit. The oracle
    * replays the full LSH + recursive-CTE component walk (q40's
    * formulation) and the same split hash. */
  private val q113 = Q(
    "q113_neardup_split",
    (s, dir) =>
      graft.operators.TrainPrep.clusterAwareSplitBy(
          Tables.documents(s, dir), SharedLsh.components(s, dir))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("doc_id")).as("docid_sum"))
        .orderBy(col("split")),
    Some {
      val mins = (0 until 8)
        .map(j => s"MIN(substr(md5('m${j / 4}' || sh), ${(j % 4) * 8 + 1}, 8)) AS h$j")
        .mkString(", ")
      s"""WITH RECURSIVE
      sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
        FROM documents, UNNEST(range(1, greatest(length(text)-4, 1)+1)) AS t(i)),
      sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, md5('0' || h0 || h1 || h2 || h3) AS bk FROM sig
        UNION ALL
        SELECT doc_id, md5('1' || h4 || h5 || h6 || h7) AS bk FROM sig),
      prs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM prs
        UNION SELECT doc_b, doc_a FROM prs),
      walk(node, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
      comp AS (SELECT node AS doc_id, MIN(label) AS component
        FROM walk GROUP BY 1),
      u AS (
        SELECT d.doc_id,
          COALESCE(c.component, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
      t AS (
        SELECT doc_id, cluster_id,
          CASE substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 1)
            WHEN 'd' THEN 'val' WHEN 'e' THEN 'test' WHEN 'f' THEN 'test'
            ELSE 'train' END AS split
        FROM u)
      SELECT split, COUNT(*) AS n_docs,
        COUNT(DISTINCT cluster_id) AS n_clusters,
        CAST(SUM(doc_id) AS BIGINT) AS docid_sum
      FROM t GROUP BY 1 ORDER BY split"""
    })

  val list: Seq[Q] = Seq(q106, q107, q108, q109, q110, q111, q112, q113)
}
