package graft

import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.operators.{Dedup, KmvSketch, TrainPrep}

/** Round-7 depth queries (q181+): the KMV set-algebra sketch that
  * completes the sketch family, and the true multi-field BM25F ranker.
  * Same determinism rules as [[Queries]] (total ORDER BY, integer /
  * fixed-point arithmetic on anything hashed, aliases matched to the
  * oracle SQL). */
object QueriesDepth {

  /** KMV SET-INTERSECTION NDV (operators/KmvSketch.scala): per-source
    * 5-shingle vocabularies sketched with k=64 minimum hash values,
    * then EVERY source pair estimated for union and intersection
    * cardinality — next to the EXACT intersection count as the twin
    * column, so the estimator's error is read directly off the result.
    * The cross-set overlap readout a curation pipeline uses to find
    * syndicated / mirrored sources without ever joining their full
    * vocabularies.
    *
    * Scale shape: the sketch aggregation is one pass over raw
    * (source, hash32) rows — no pre-distinct shuffle; the Aggregator's
    * bounded buffer dedups and ships ≤ 64 longs per source however
    * large the source is. The pair stage runs over |sources|² sketch
    * ROWS (bounded, broadcast), never data. The exact twin is a
    * shingle-keyed self-join whose per-key fan-out is ≤ |sources|² —
    * at true corpus scale you would drop the twin and keep the sketch,
    * which is the point of the query. All-integer: the estimate chain
    * is deterministic given md5, so DuckDB reproduces it EXACTLY via a
    * rank ≤ k window over identical 32-bit hashes. */
  private val q181 = Q(
    "q181_kmv_intersection",
    (s, dir) => {
      val k = 64
      val docs = Tables.documents(s, dir)
      val hashes = docs.select(col("source"),
          explode(Dedup.charShingles(col("text"), 5)).as("sh"))
        .select(col("source"), KmvSketch.hash32(col("sh")).as("h"))
      val sk = hashes.groupBy(col("source"))
        .agg(KmvSketch.lowestK(col("h"), k).as("kmv"))
        .localCheckpoint() // 1 row per source; read by both pair legs
      val pairs = sk
        .select(col("source").as("source_a"), col("kmv").as("ka"))
        .join(sk.select(col("source").as("source_b"), col("kmv").as("kb")),
          col("source_a") < col("source_b"))
        .withColumn("m", slice(array_sort(array_union(col("ka"), col("kb"))),
          1, k))
        .withColumn("est_union", KmvSketch.estimateNdv("m", k))
        .withColumn("k_int",
          size(array_intersect(array_intersect(col("m"), col("ka")),
            col("kb"))).cast("long"))
        .withColumn("est_inter", expr(s"k_int * est_union div $k"))
      val srcsh = docs.select(col("source"),
          explode(Dedup.charShingles(col("text"), 5)).as("sh"))
        .distinct()
      val exact = srcsh.select(col("source").as("source_a"), col("sh"))
        .join(srcsh.select(col("source").as("source_b"), col("sh")),
          Seq("sh"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("xi"))
      pairs
        .join(exact, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"),
          col("est_union"), col("k_int"), col("est_inter"),
          coalesce(col("xi"), lit(0L)).as("exact_inter"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH sh AS (SELECT DISTINCT source, substr(text, i, 5) AS s
        FROM documents,
          UNNEST(range(1, greatest(length(text)-4, 1)+1)) AS t(i)),
      hh AS (SELECT DISTINCT source,
          CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h FROM sh),
      km AS (SELECT source, h FROM (
          SELECT source, h,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM hh) r WHERE rn <= 64),
      srcs AS (SELECT DISTINCT source FROM documents),
      pr AS (SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
      u0 AS (
        SELECT p.sa, p.sb, k.h FROM pr p JOIN km k ON k.source = p.sa
        UNION
        SELECT p.sa, p.sb, k.h FROM pr p JOIN km k ON k.source = p.sb),
      m AS (SELECT sa, sb, h FROM (
          SELECT sa, sb, h,
            ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
          FROM u0) r WHERE rn <= 64),
      ms AS (SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS mk, MAX(h) AS kth
          FROM m GROUP BY 1, 2),
      ki AS (SELECT m.sa, m.sb, CAST(COUNT(*) AS BIGINT) AS kint
          FROM m JOIN km x ON x.source = m.sa AND x.h = m.h
                 JOIN km y ON y.source = m.sb AND y.h = m.h
          GROUP BY 1, 2),
      ex AS (SELECT x.source AS sa, y.source AS sb,
            CAST(COUNT(*) AS BIGINT) AS xi
          FROM sh x JOIN sh y ON y.s = x.s AND x.source < y.source
          GROUP BY 1, 2),
      est AS (SELECT ms.sa, ms.sb,
          CASE WHEN ms.mk < 64 THEN ms.mk
               ELSE 270582939648 // ms.kth END AS eu,
          COALESCE(ki.kint, 0) AS kint
        FROM ms LEFT JOIN ki ON ki.sa = ms.sa AND ki.sb = ms.sb)
      SELECT est.sa AS source_a, est.sb AS source_b,
        CAST(est.eu AS BIGINT) AS est_union,
        CAST(est.kint AS BIGINT) AS k_int,
        CAST(est.kint * est.eu // 64 AS BIGINT) AS est_inter,
        CAST(COALESCE(ex.xi, 0) AS BIGINT) AS exact_inter
      FROM est LEFT JOIN ex ON ex.sa = est.sa AND ex.sb = est.sb
      ORDER BY source_a, source_b"""))

  /** TRUE MULTI-FIELD BM25F (TrainPrep.bm25MultiFieldRank): ranking
    * over two genuinely distinct fields — a metadata field
    * (source + lang, weight 4) and the body text (weight 1) — with
    * per-field length normalization, the property q123's early-merge
    * simplification lacks: a metadata hit in the 2-token field is
    * normalized against the metadata corpus average, not diluted by
    * the ~70-token body. Query mixes one metadata term ('src7') with
    * two body terms, so both field paths and the cross-field tf merge
    * execute. Fixed-point double recipe per the operator scaladoc;
    * the oracle spells the identical token sequence. */
  private val q183 = Q(
    "q183_bm25f_multifield",
    (s, dir) =>
      TrainPrep.bm25MultiFieldRank(
        Tables.documents(s, dir)
          .withColumn("meta", concat_ws(" ", col("source"), col("lang"))),
        "doc_id", Seq(("meta", 4L), ("text", 1L)),
        Seq("src7", "scan", "window"), topK = 20),
    Some("""WITH d AS (SELECT doc_id, source || ' ' || lang AS f0,
          text AS f1 FROM documents),
      t0 AS (SELECT doc_id, ts[CAST(i AS INT)] AS term
        FROM (SELECT doc_id, string_split(f0, ' ') AS ts FROM d),
          UNNEST(range(1, len(ts)+1)) AS t(i)),
      t1 AS (SELECT doc_id, ts[CAST(i AS INT)] AS term
        FROM (SELECT doc_id, string_split(f1, ' ') AS ts FROM d),
          UNNEST(range(1, len(ts)+1)) AS t(i)),
      p0 AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf0
        FROM t0 WHERE term IN ('src7', 'scan', 'window') GROUP BY 1, 2),
      p1 AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf1
        FROM t1 WHERE term IN ('src7', 'scan', 'window') GROUP BY 1, 2),
      m AS (SELECT term, doc_id, COALESCE(tf0, 0) AS tf0,
          COALESCE(tf1, 0) AS tf1
        FROM p0 FULL JOIN p1 USING (term, doc_id)),
      l AS (SELECT doc_id,
          CAST(len(string_split(f0, ' ')) AS BIGINT) AS dl0,
          CAST(len(string_split(f1, ' ')) AS BIGINT) AS dl1 FROM d),
      st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl0) AS BIGINT) AS tt0,
          CAST(SUM(dl1) AS BIGINT) AS tt1 FROM l),
      df AS (SELECT term, COUNT(*) AS df FROM m GROUP BY 1),
      sc AS (SELECT m.doc_id,
          CAST(FLOOR(
            (CAST(2*(st.nd - df.df) + 1 AS DOUBLE)
               / CAST(2*df.df + 1 AS DOUBLE))
            * ((5 * (CAST(16*m.tf0*st.tt0 AS DOUBLE)
                       / CAST(st.tt0 + 3*l.dl0*st.nd AS DOUBLE)
                     + CAST(4*m.tf1*st.tt1 AS DOUBLE)
                       / CAST(st.tt1 + 3*l.dl1*st.nd AS DOUBLE)))
               / (6 + 5 * (CAST(16*m.tf0*st.tt0 AS DOUBLE)
                       / CAST(st.tt0 + 3*l.dl0*st.nd AS DOUBLE)
                     + CAST(4*m.tf1*st.tt1 AS DOUBLE)
                       / CAST(st.tt1 + 3*l.dl1*st.nd AS DOUBLE))))
            * 1e6) AS BIGINT) AS s
        FROM m JOIN df USING (term) JOIN l USING (doc_id) CROSS JOIN st)
      SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(s) AS BIGINT) AS score_fp
      FROM sc GROUP BY 1
      ORDER BY score_fp DESC, doc_id ASC LIMIT 20"""))

  val list: Seq[Q] = Seq(q181, q183)
}
