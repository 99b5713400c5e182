package graft

import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.operators.{Curation, TextAnalysis}

/** Training-data-pipeline queries, continued (q55+): corpus curation
  * operations beyond the reference's own surface — cross-document
  * boilerplate detection, n-gram-level decontamination, vocabulary
  * statistics, and sequence packing. Same determinism rules as
  * [[Queries]] (total ORDER BY, integer/decimal arithmetic on anything
  * hashed, aliases matched to the oracle SQL).
  *
  * Shuffle-economy rule shared by the n-gram queries here: grams are
  * md5-hashed BEFORE the first shuffle, so only 16-byte keys move —
  * the gram text itself never leaves the scan stage. Grouping by
  * md5(gram) and grouping by the gram string partition rows
  * identically (collisions are 2^-128), so the DuckDB oracles can use
  * the raw string while the Spark plan ships hashes.
  */
object QueriesPipeline {

  /** Cross-document boilerplate n-gram detection — the shared-footer /
    * template-text filter in large-corpus curation (the line-dedup family;
    * this corpus has no newlines, so the unit is the word 8-gram). An
    * 8-word sentinel is appended to every 7th doc so the flag path
    * executes; detection itself is purely cross-document: distinct
    * (gram, doc) pairs → grams present in >= 3 distinct docs → flag any
    * doc containing one. Two shuffles, both on 16-byte gram hashes. */
  private val q55 = Q(
    "q55_boilerplate_ngrams",
    (s, dir) => {
      val txt = when(col("doc_id") % 7 === 0,
        concat_ws(" ", col("text"),
          lit("all rights reserved contact site admin for removal")))
        .otherwise(col("text"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), txt.as("txt"))
      val flagged = Curation.boilerplateDocs(docs, "doc_id", "txt",
          n = 8, minDocs = 3)
        .withColumn("flag", lit(1))
      docs.join(flagged, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"), count(col("flag")).as("flagged"))
        .orderBy(col("lang"))
    },
    Some("""WITH d AS (
        SELECT doc_id, lang,
          CASE WHEN doc_id % 7 = 0
               THEN text || ' all rights reserved contact site admin for removal'
               ELSE text END AS txt
        FROM documents),
      toks AS (SELECT doc_id, lang, string_split(txt, ' ') AS t FROM d),
      grams AS (
        SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id, UNNEST(list_transform(range(1, len(t) - 6),
            i -> array_to_string(
              list_slice(t, CAST(i AS INT), CAST(i AS INT) + 7), ' '))) AS g
          FROM toks WHERE len(t) >= 8)),
      boiler AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 3),
      flagged AS (SELECT DISTINCT doc_id FROM grams
                  WHERE g IN (SELECT g FROM boiler))
      SELECT lang, COUNT(*) AS docs, COUNT(f.doc_id) AS flagged
      FROM d LEFT JOIN flagged f USING (doc_id)
      GROUP BY 1 ORDER BY lang"""))

  /** n-gram-level train/test decontamination — the GPT-3-appendix-style
    * leakage audit that exact-hash contamination (q50) misses: a train
    * doc is contaminated if it shares ANY word 5-gram with any test-split
    * doc. Split assignment reuses q50's md5 bucket scheme; a 6-word
    * benchmark-ish sentinel on every 11th doc guarantees cross-split
    * overlap. Scale shape: test grams (the small side, distinct-reduced)
    * feed a LEFT SEMI join against train grams — hashes only. */
  private val q56 = Q(
    "q56_ngram_decontaminate",
    (s, dir) => {
      val h = substring(
        md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1)
      val split = when(h.isin("d"), "val")
        .when(h.isin("e", "f"), "test")
        .otherwise("train")
      val txt = when(col("doc_id") % 11 === 0,
        concat_ws(" ", col("text"), lit("what is the capital of france")))
        .otherwise(col("text"))
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), split.as("split"), txt.as("txt"))
      val contaminated = Curation.contaminatedDocs(
          base.filter(col("split") === "train"),
          base.filter(col("split") === "test"),
          "doc_id", "txt", n = 5)
        .withColumn("hit", lit(1))
      base.filter(col("split") === "train")
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("train_docs"), count(col("hit")).as("contaminated"))
        .orderBy(col("lang"))
    },
    Some("""WITH d AS (
        SELECT doc_id, lang,
          CASE substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
            WHEN 'd' THEN 'val'
            WHEN 'e' THEN 'test' WHEN 'f' THEN 'test'
            ELSE 'train' END AS split,
          CASE WHEN doc_id % 11 = 0
               THEN text || ' what is the capital of france'
               ELSE text END AS txt
        FROM documents),
      toks AS (SELECT doc_id, lang, split, string_split(txt, ' ') AS t FROM d),
      grams AS (
        SELECT doc_id, split, UNNEST(list_transform(range(1, len(t) - 3),
          i -> array_to_string(
            list_slice(t, CAST(i AS INT), CAST(i AS INT) + 4), ' '))) AS g
        FROM toks WHERE len(t) >= 5),
      testg AS (SELECT DISTINCT g FROM grams WHERE split = 'test'),
      cont AS (SELECT DISTINCT doc_id FROM grams
               WHERE split = 'train' AND g IN (SELECT g FROM testg))
      SELECT lang, COUNT(*) AS train_docs, COUNT(c.doc_id) AS contaminated
      FROM d LEFT JOIN cont c USING (doc_id)
      WHERE d.split = 'train'
      GROUP BY 1 ORDER BY lang"""))

  /** Vocabulary head — corpus token-frequency statistics (the Zipf-head
    * audit run before tokenizer training): term frequency + document
    * frequency per token, top 20 by tf with deterministic ties. One
    * explode, one shuffle on the token; countDistinct(doc_id) rides the
    * same aggregation. TakeOrderedAndProject caps the result exchange. */
  private val q57 = Q(
    "q57_vocab_topk",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tok").asc)
        .limit(20)
    },
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY 1
      ORDER BY tf DESC, tok ASC LIMIT 20"""))

  /** Sequence packing — concatenate-and-chop document packing into
    * fixed token-budget training sequences (budget 512): exclusive
    * prefix sum of token counts per source stream, seq = prefix div
    * budget, then a per-source fill census. The window partitions by
    * source, so streams pack in parallel; at 100 TB the unit would be
    * (source, shard) with the same plan. Integer arithmetic end to end
    * (the lone division is exact: counts < 2^53). */
  private val q58 = Q(
    "q58_seq_packing",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      val packed = Curation.packSequences(docs, "source", "doc_id",
        "tok", budget = 512L)
      packed.groupBy(col("source"), col("seq"))
        .agg(count(lit(1)).as("docs"), sum(col("tok")).as("tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("seqs"), sum(col("docs")).as("docs"),
          max(col("tokens")).as("max_fill"), min(col("tokens")).as("min_fill"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS tok
        FROM documents),
      p AS (SELECT source, doc_id, tok,
          CAST(FLOOR(COALESCE(SUM(tok) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
            AS BIGINT) AS seq
        FROM d),
      b AS (SELECT source, seq, COUNT(*) AS docs,
              CAST(SUM(tok) AS BIGINT) AS tokens
            FROM p GROUP BY 1, 2)
      SELECT source, COUNT(*) AS seqs, CAST(SUM(docs) AS BIGINT) AS docs,
        MAX(tokens) AS max_fill, MIN(tokens) AS min_fill
      FROM b GROUP BY 1 ORDER BY source"""))

  val list: Seq[Q] = Seq(q55, q56, q57, q58)
}
