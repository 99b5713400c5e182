package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-SPAN coverage — "what fraction of each document's
  * characters is text that also appears in other documents", the
  * substring-level dedup diagnostic from the exact-substring-dedup
  * line of work (suffix-array dedup; cf. PAPERS.md). Where q17/q40
  * decide WHICH docs are near-duplicates, this measures HOW MUCH of a
  * doc is duplicated — the signal used to cut boilerplate-heavy or
  * template-stitched documents that pass whole-doc near-dup checks.
  *
  * Pipeline (all shuffles carry 16-byte hashes or ints, never text):
  *  1. every char n-gram position is hashed IN PLACE with `transform`
  *     over `sequence` — the text column never survives the explode
  *     (grams become md5 strings before `posexplode` multiplies rows);
  *  2. grams held by ≥ minDocs distinct docs are found with one
  *     hash-keyed aggregation; a semi join marks the duplicated
  *     POSITIONS per doc;
  *  3. positions collapse to covered-character counts by interval
  *     union, spelled as gaps-and-islands: a window per doc ordered by
  *     position opens a new island when `pos > prev + n` (positions
  *     ascending make the running max end simply prev + n), each
  *     island covers `max(pos) + n − min(pos)` chars.
  *
  * Scale: the per-doc window partitions by doc id and holds at most
  * len(text) rows — bounded by document length, not corpus size, so
  * no low-cardinality window hazard (q39's trap, SCALE.md). At 100 TB
  * the gram stage dominates; stride sampling (hash every s-th
  * position) divides it by s at the cost of span-boundary resolution
  * ±s, the standard trade.
  */
object DupSpans {

  /** (doc_id, pos) of every position whose char n-gram occurs in at
    * least `minDocs` DISTINCT documents. Positions are 1-based.
    *
    * Shuffle economies (sf0.1: 9.2 s naive → ~3 s): grams move as
    * 16-BYTE unhex'd md5 binaries, not 32-char hex strings (halves
    * every exchange), and the minDocs=2 common case evaluates
    * "≥2 distinct docs" with a window min/max in ONE gram shuffle —
    * the aggregate+semi-join formulation re-runs the md5 explode as
    * the probe side, and the gram stage is the dominant cost.
    *
    * HAZARD (the honest trade of that window): WindowExec buffers each
    * gram's FULL position list in its task (spill-backed), so a hot
    * boilerplate gram present in a large fraction of a huge corpus
    * concentrates its rows in one buffered group — whereas the
    * aggregate path partial-aggregates map-side and the semi-join
    * probe STREAMS. At test scale the window wins; for corpora with
    * known template boilerplate pass `windowFastPath = false` (or
    * strip boilerplate first, Curation.boilerplateDocs). */
  /** The shared stage-1 artifact: (doc_id, pos, h) — every char n-gram
    * position hashed in place (16-byte unhex'd md5; text never survives
    * the explode). Both [[dupPositions]] (q75) and
    * [[ExactSubstring.dupSpans]] (q86) consume exactly this table, so
    * `SharedGrams` materializes it once per session+input, pre-
    * partitioned by h — each consumer's h-keyed window then reuses the
    * layout without re-exploding or re-shuffling. */
  def grams(docs: DataFrame, idCol: String, textCol: String,
            n: Int): DataFrame = {
    require(n >= 2)
    docs
      .where(length(col(textCol)) >= n) // sequence(1,0) would DESCEND
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length($textCol) - ${n - 1}), " +
            s"i -> unhex(md5(substring($textCol, i, $n))))"))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
  }

  def dupPositions(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minDocs: Int,
                   windowFastPath: Boolean = true): DataFrame =
    dupPositionsFromGrams(grams(docs, idCol, textCol, n), minDocs,
      windowFastPath)

  /** [[dupPositions]] over a prebuilt (doc_id, pos, h) gram table. */
  def dupPositionsFromGrams(grams: DataFrame, minDocs: Int,
                            windowFastPath: Boolean = true): DataFrame = {
    require(minDocs >= 2)
    if (minDocs == 2 && windowFastPath) {
      // single-shuffle shape: instead of aggregating the dup-hash set
      // and semi-joining the grams back (which re-runs the whole md5
      // explode as the probe side — the gram stage is the dominant
      // cost), ship the grams ONCE partitioned by hash and evaluate
      // "≥2 distinct docs" in place with an unbounded window min/max
      // over each hash group (sf0.1: ~8 s → ~3 s)
      val w = Window.partitionBy(col("h"))
      grams
        .withColumn("mn", min(col("doc_id")).over(w))
        .withColumn("mx", max(col("doc_id")).over(w))
        .filter(col("mn") =!= col("mx"))
        .select(col("doc_id"), col("pos"))
    } else {
      // streams hot grams: map-side partial agg + semi-join probe
      val dup = grams.groupBy(col("h"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= minDocs)
        .select(col("h"))
      grams.join(dup, Seq("h"), "left_semi").select(col("doc_id"), col("pos"))
    }
  }

  /** Per-doc covered-character count: (doc_id, covered BIGINT). Docs
    * with no duplicated gram are absent. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int,
               windowFastPath: Boolean = true): DataFrame =
    coverageFromPositions(
      dupPositions(docs, idCol, textCol, n, minDocs, windowFastPath), n)

  /** Maximal runs of overlapping/adjacent n-length windows over
    * duplicated (doc_id, pos) rows — the ONE gaps-and-islands merge
    * both substring-dedup consumers read (q75 sums run lengths, q86
    * emits the runs as spans): a new island opens when
    * `pos > prev + n`, each island covers max(pos)+n−min(pos) chars.
    * Returns (doc_id, run_start, run_len). */
  def islandRuns(p: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    p
      .withColumn("b",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + n, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("b")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("run_start"),
        (max(col("pos")) + n - min(col("pos"))).as("run_len"))
      .select(col("doc_id"), col("run_start"), col("run_len"))
  }

  /** [[coverage]] over prebuilt duplicated (doc_id, pos) rows. */
  def coverageFromPositions(p: DataFrame, n: Int): DataFrame =
    islandRuns(p, n)
      .groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("covered"))
}
