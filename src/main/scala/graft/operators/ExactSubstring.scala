package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicated-substring spans — the full substring-level dedup
  * deliverable (the "remove duplicated spans" tool; cf. the
  * suffix-array exact-substring-dedup line of work in PAPERS.md):
  * for every document, the maximal character ranges covered by some
  * substring of length ≥ `minLen` that occurs at least twice in the
  * corpus (ANY two occurrences, including twice within one document —
  * stricter than DupSpans' cross-document-only contract, and emitting
  * the spans themselves rather than per-doc coverage counts).
  *
  * Exactness argument (why a fixed-length gram cover IS the exact
  * answer, no suffix array required for the SPAN semantics): a
  * duplicated substring S with |S| = m ≥ L occurring at positions
  * p₁ ≠ p₂ duplicates every one of its L-grams, so positions
  * p₁..p₁+m−L all start duplicated L-grams and their L-windows cover
  * exactly [p₁, p₁+m−1]; conversely a duplicated L-gram is itself a
  * duplicated substring of length L. Hence
  * union-of-duplicated-substring-chars = union-of-duplicated-L-gram
  * windows, character-exact. (A suffix array additionally yields the
  * per-span MATCH LENGTH in one pass — the scale path when span
  * lengths, not just extents, are needed: prefix-doubling SA
  * construction is log n sorted shuffles, still Spark-shaped.)
  *
  * Cost shape, in DupSpans' shuffle economy (16-byte in-place md5
  * grams, text never explodes):
  *  1. gram stage: one shuffle of (doc_id, pos, h) keyed by h;
  *     occurrence-count ≥ 2 evaluated in place with a window count
  *     (`windowFastPath`, same hot-gram hazard + fallback flag as
  *     DupSpans) or with a map-side-combined aggregate + semi join;
  *  2. hash→text confirm: ONLY the surviving candidate positions
  *     rejoin the docs to re-extract their literal gram, which is
  *     grouped BY TEXT to discard md5-collision false positives — the
  *     "exact" in the name rests on string equality, not on a hash;
  *     confirm volume ≈ truly-duplicated positions, not corpus size;
  *  3. spans: per-doc gaps-and-islands (window bounded by doc length,
  *     no low-cardinality hazard) merges overlapping/adjacent L-windows
  *     into maximal (span_start, span_len) rows.
  */
object ExactSubstring {

  /** (doc_id, span_start, span_len): maximal spans of text duplicated
    * somewhere in the corpus at length ≥ minLen. Positions 1-based;
    * docs shorter than minLen never emit. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               minLen: Int, windowFastPath: Boolean = true): DataFrame =
    dupSpansFromGrams(
      DupSpans.grams(docs, idCol, textCol, minLen),
      docs, idCol, textCol, minLen, windowFastPath)

  /** [[dupSpans]] over a prebuilt [[DupSpans.grams]] table (the shared
    * stage-1 artifact — see `SharedGrams`); `docs` is still needed for
    * the candidate-bounded text confirm rejoin. */
  def dupSpansFromGrams(grams: DataFrame, docs: DataFrame, idCol: String,
                        textCol: String, minLen: Int,
                        windowFastPath: Boolean = true): DataFrame = {
    require(minLen >= 2, "minLen must be at least 2")
    spansFromCandidates(
      hashDupCandidates(grams, windowFastPath),
      docs, idCol, textCol, minLen)
  }

  /** Stage-1 screen: positions whose 16-byte gram hash occurs ≥ 2
    * times (window in-place count, or partial-agg + semi-join). */
  private def hashDupCandidates(grams: DataFrame,
                                windowFastPath: Boolean): DataFrame =
    if (windowFastPath) {
      val wh = Window.partitionBy(col("h"))
      grams.withColumn("c", count(lit(1)).over(wh))
        .filter(col("c") >= 2)
        .select(col("doc_id"), col("pos"))
    } else {
      val dupH = grams.groupBy(col("h"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("h"))
      grams.join(dupH, Seq("h"), "left_semi")
        .select(col("doc_id"), col("pos"))
    }

  /** Stages 2-3: candidate-bounded literal-text confirm (discards md5
    * collisions) + per-doc gaps-and-islands span merge. */
  private def spansFromCandidates(cand: DataFrame, docs: DataFrame,
                                  idCol: String, textCol: String,
                                  minLen: Int): DataFrame = {
    val d = docs.where(length(col(textCol)) >= minLen)
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    val withGram = cand.join(d, "doc_id")
      .select(col("doc_id"), col("pos"),
        expr(s"substring(_text, pos, $minLen)").as("gram"))
    val wg = Window.partitionBy(col("gram"))
    val confirmed = withGram
      .withColumn("c", count(lit(1)).over(wg))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("pos"))
    DupSpans.islandRuns(confirmed, minLen)
      .select(col("doc_id"), col("run_start").as("span_start"),
        col("run_len").cast("long").as("span_len"))
  }

  /** [[dupSpans]] computed in `passes` hash-sliced rounds — the
    * SCRATCH-BOUNDED execution plan. The single-shuffle form ships the
    * ENTIRE gram table (≈ total characters × 28 B) through one
    * exchange; at 10M synthetic docs that is ~10² GB of shuffle — more
    * scratch than many single machines hold, and the measured failure
    * mode of this operator's first 10M run (ENOSPC, then tmpfs OOM).
    * Slicing the gram space by `pmod(hash(h), passes)` BEFORE the
    * exchange divides the per-round shuffle footprint by `passes`
    * while staying EXACT: gram equality implies hash equality, so no
    * duplicated gram ever crosses slices and the union of per-round
    * candidates is precisely the single-pass candidate set
    * (spec-asserted). The price is re-running the narrow gram
    * derivation once per round — CPU for scratch, the trade a
    * disk-constrained deployment actually wants; with ample scratch,
    * keep `dupSpans`. Each round's candidate positions (tiny: only
    * duplicated positions survive) are localCheckpoint'd so the
    * round's shuffle becomes unreferenced, and an explicit GC nudges
    * the ContextCleaner to reap those files before the next round
    * writes its own — peak scratch ≈ one slice, not the sum. */
  def dupSpansSharded(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int, passes: Int,
                      windowFastPath: Boolean = true): DataFrame = {
    require(passes >= 1, "passes must be positive")
    require(minLen >= 2, "minLen must be at least 2")
    val slices = (0 until passes).map { p =>
      val g = DupSpans.grams(docs, idCol, textCol, minLen)
        .filter(pmod(hash(col("h")), lit(passes)) === p)
      val cp = hashDupCandidates(g, windowFastPath).localCheckpoint()
      if (passes > 1) System.gc() // let the cleaner reap this round's shuffle
      cp
    }
    spansFromCandidates(slices.reduce(_ union _),
      docs, idCol, textCol, minLen)
  }

  /** Splice the given spans OUT of each document's text — the rewrite
    * step that turns span DETECTION into a cleaned corpus. `spans`
    * carries (idCol, span_start, span_len) with 1-based, maximal,
    * non-overlapping ranges per doc ([[dupSpans]]' output contract;
    * which occurrences to excise — all, non-canonical, boilerplate-only
    * — is the caller's span selection). Returns
    * (idCol, clean_text, removed_chars, n_spans) for AFFECTED docs.
    *
    * Shape: one doc-keyed aggregation of the span list (bounded per
    * group — maximal spans of length ≥ minLen cap the count at
    * len/minLen), one equi-join back to the text, then a pure
    * per-row `aggregate` fold that concatenates the inter-span gaps —
    * the text itself never explodes and never shuffles past the one
    * doc-keyed join. 100 TB-safe by the same argument as the span
    * detector it composes with. */
  def removeSpans(docs: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val perDoc = spans.groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(
          col("span_start").cast("long").as("s"),
          col("span_len").cast("long").as("l")))).as("sp"),
        sum(col("span_len")).cast("long").as("removed_chars"),
        count(lit(1)).as("n_spans"))
    val t = col(textCol)
    // fold state: gs = 1-based start of the next unremoved gap; acc =
    // cleaned prefix so far. Each span appends the gap before it and
    // advances gs past the span; the finish lambda appends the tail.
    val spliced = aggregate(
      col("sp"),
      struct(lit(1L).as("gs"), lit("").as("acc")),
      (st, s) => struct(
        (s.getField("s") + s.getField("l")).as("gs"),
        concat(st.getField("acc"),
          t.substr(st.getField("gs").cast("int"),
            greatest(lit(0),
              (s.getField("s") - st.getField("gs")).cast("int"))))
          .as("acc")),
      st => concat(st.getField("acc"),
        t.substr(st.getField("gs").cast("int"),
          greatest(lit(0),
            length(t) - st.getField("gs").cast("int") + 1))))
    docs.select(col(idCol), t).join(perDoc, Seq(idCol))
      .select(col(idCol), spliced.as("clean_text"),
        col("removed_chars"), col("n_spans"))
  }
}
