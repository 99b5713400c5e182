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
    * Two shuffle economies measured at sf0.1 (9.2 s → target <4 s):
    * grams move as 16-BYTE unhex'd md5 binaries, not 32-char hex
    * strings (halves every exchange), and the minDocs=2 common case
    * detects "≥2 distinct docs" as `min(doc_id) != max(doc_id)` — one
    * plain map-side-combinable aggregate instead of the
    * distinct-aggregate rewrite's Expand + double shuffle. */
  def dupPositions(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minDocs: Int): DataFrame = {
    require(n >= 2 && minDocs >= 2)
    val grams = docs
      .where(length(col(textCol)) >= n) // sequence(1,0) would DESCEND
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length($textCol) - ${n - 1}), " +
            s"i -> unhex(md5(substring($textCol, i, $n))))"))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
    val dup =
      if (minDocs == 2)
        grams.groupBy(col("h"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select(col("h"))
      else
        grams.groupBy(col("h"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= minDocs)
          .select(col("h"))
    grams.join(dup, Seq("h"), "left_semi").select(col("doc_id"), col("pos"))
  }

  /** Per-doc covered-character count: (doc_id, covered BIGINT). Docs
    * with no duplicated gram are absent. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int): DataFrame = {
    val p = dupPositions(docs, idCol, textCol, n, minDocs)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val isl = p
      .withColumn("b",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + n, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("b")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) + n - min(col("pos"))).as("run_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run_len")).as("covered"))
  }
}
