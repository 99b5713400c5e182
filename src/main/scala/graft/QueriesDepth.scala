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

  /** POWER-ITERATION PRINCIPAL COMPONENT of the embedding second-moment
    * matrix — the spectral member of the analytics family (PCA top
    * direction for whitening / drift monitoring), made engine-exact on
    * the ⌊x·10⁶⌋ BIGINT grid (q126's float recipe): S = Σ xg·xgᵀ is an
    * exact 64×64 BIGINT Gram matrix (one self-join agg — the classic
    * AllReduce covariance, map-side combinable, d² state per task),
    * then two fixed power-iteration rounds v ← S·v with an integer
    * L∞ rescale after each multiply. Every division is made
    * positive-operand first (CASE on sign) because Spark `div`
    * truncates toward zero while DuckDB `//` floors — they agree only
    * on non-negatives (the recorded q169 gotcha). Output: the 64
    * fixed-point components of v₂ plus the L∞ norm of the last
    * un-rescaled multiply (the eigenvalue growth proxy), all BIGINT.
    *
    * Scale: the Gram agg is the only data-sized stage (d² products per
    * row, zero shuffles before the 4096-group agg); iterations run on
    * 4096-row/64-row broadcast frames regardless of corpus size. */
  private val q184 = Q(
    "q184_power_iteration",
    (s, dir) => {
      val g = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i").cast("long").as("i"),
          floor(col("x").cast("double") * lit(1e6)).cast("long").as("xg"))
      val sp = g
        .join(g.select(col("vec_id"), col("i").as("j"), col("xg").as("yg")),
          "vec_id")
        .groupBy(col("i"), col("j"))
        .agg(sum(col("xg") * col("yg")).as("sraw"))
        .select(col("i"), col("j"), expr(
          "CASE WHEN sraw < 0 THEN -((-sraw) div 1000000) " +
            "ELSE sraw div 1000000 END").as("sv"))
        .localCheckpoint() // 4096 rows, read by both iterations
      val w1 = sp.filter(col("j") === 0)
        .select(col("i"), (col("sv") * lit(1000000L)).as("w"))
      val m1 = w1.agg(
        expr("greatest(max(abs(w)) div 1000000, 1L)").as("st"))
      val v1 = w1.crossJoin(broadcast(m1))
        .select(col("i").as("j"), expr(
          "CASE WHEN w < 0 THEN -((-w) div st) ELSE w div st END").as("v"))
      val w2 = sp.join(broadcast(v1), "j")
        .groupBy(col("i"))
        .agg(sum(col("sv") * col("v")).as("w"))
      val m2 = w2.agg(
        expr("greatest(max(abs(w)) div 1000000, 1L)").as("st"),
        max(abs(col("w"))).as("mx"))
      w2.crossJoin(broadcast(m2))
        .select(col("i"), expr(
          "CASE WHEN w < 0 THEN -((-w) div st) ELSE w div st END")
          .as("v2_fp"),
          col("mx").as("linf_w2"))
        .orderBy(col("i"))
    },
    Some("""WITH g AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
          CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
            AS BIGINT) AS xg
        FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
      sr AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.xg * b.xg) AS BIGINT)
            AS sraw
        FROM g a JOIN g b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      sp AS (SELECT i, j, CASE WHEN sraw < 0 THEN -((-sraw) // 1000000)
            ELSE sraw // 1000000 END AS sv FROM sr),
      w1 AS (SELECT i, sv * 1000000 AS w FROM sp WHERE j = 0),
      m1 AS (SELECT GREATEST(MAX(ABS(w)) // 1000000, 1) AS st FROM w1),
      v1 AS (SELECT w1.i AS j,
          CASE WHEN w < 0 THEN -((-w) // m1.st) ELSE w // m1.st END AS v
        FROM w1 CROSS JOIN m1),
      w2 AS (SELECT sp.i, CAST(SUM(sp.sv * v1.v) AS BIGINT) AS w
        FROM sp JOIN v1 USING (j) GROUP BY 1),
      m2 AS (SELECT GREATEST(MAX(ABS(w)) // 1000000, 1) AS st,
          MAX(ABS(w)) AS mx FROM w2)
      SELECT w2.i,
        CASE WHEN w < 0 THEN -((-w) // m2.st) ELSE w // m2.st END AS v2_fp,
        CAST(m2.mx AS BIGINT) AS linf_w2
      FROM w2 CROSS JOIN m2 ORDER BY i"""))

  /** DUPLICATE PROPENSITY BY LENGTH — exact-duplicate membership rate
    * per 100-char document-length bucket, in ppm: the curation
    * diagnostic that says WHERE dedup is earning its keep (short
    * template-y docs duplicate far more than long organic ones, and a
    * pipeline that samples by length needs this curve, not the global
    * rate). Kernel: one narrow window over (md5(text), bucket) rows —
    * 16-byte hashes and a long shuffle, text never leaves the scan —
    * then a bounded bucket census. */
  private val q185 = Q(
    "q185_dup_length_profile",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      Tables.documents(s, dir)
        .select(md5(col("text")).as("h"),
          expr("n_chars div 100").as("bucket"))
        .withColumn("grp", count(lit(1)).over(w))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("grp") > 1, 1L).otherwise(0L)).as("n_dup_members"))
        .withColumn("dup_ppm", expr("n_dup_members * 1000000 div n_docs"))
        .orderBy(col("bucket"))
    },
    Some("""WITH d AS (SELECT n_chars // 100 AS bucket,
          COUNT(*) OVER (PARTITION BY md5(text)) AS grp
        FROM documents)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_members,
        CAST(SUM(CASE WHEN grp > 1 THEN 1 ELSE 0 END) * 1000000
          // COUNT(*) AS BIGINT) AS dup_ppm
      FROM d GROUP BY 1 ORDER BY bucket"""))

  val list: Seq[Q] = Seq(q181, q183, q184, q185)
}
