package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (stopword heuristic), quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs), so
  * they fuse into the scan's WholeStageCodegen span.
  */
object TextAnalysis {

  val EnStopwords: Seq[String] =
    Seq("the", "a", "is", "of", "and", "to", "in")

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of lowercase letters or digit runs. */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+"))

  /** Fraction of whitespace tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val hits = size(filter(tokens(text),
      t => EnStopwords.map(w => t === w).reduce(_ || _)))
    hits / tokenCount(text)
  }

  /** n-gram-free language-ID heuristic: stopword density ⇒ 'en'.
    * (The synthetic corpus is English-like for every `lang` label; real
    * deployment would carry one stopword set per candidate language and
    * argmax the densities — same plan shape, more when-branches.) */
  def langGuess(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, "en").otherwise("other")

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]"))

  /** Quality score in [0,1]: length component + stopword density +
    * punctuation sparsity. Rational arithmetic only (no exp/log), so the
    * value is bit-identical across engines. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text) / lit(100.0)) * 0.5 +
      stopwordRatio(text) * 0.3 +
      (lit(1.0) - least(lit(1.0), punctCount(text) / lit(20.0))) * 0.2

  /** Word-bigram list, built with zip_with over two slices instead of
    * per-index element_at lambdas. The distinction is the HOT-PATH
    * rule for higher-order functions: expressions INSIDE a lambda are
    * re-evaluated per element and excluded from subexpression
    * elimination, so the old `try_element_at(t, i)` form re-ran
    * split(text) ~2×|tokens| times per row (measured 0.8 ms/doc —
    * 4 s at sf0.1, hours at crawl scale); as HOF *arguments* the
    * token array and slices evaluate once per row and the lambda
    * touches only its own variables. Docs with FEWER THAN 2 tokens
    * yield `[]` — a deliberate behavior change from the pre-r9 form,
    * which returned a 1-element array holding the lone token
    * (concat_ws dropped the null partner); `[]` is the correct bigram
    * set and the in-repo caller (repetitionRatio) guards n<2 either
    * way. External callers should expect the empty array. */
  def wordBigrams(text: Column): Column = {
    val t = tokens(text)
    val n1 = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Word n-gram list (space-joined), empty for docs with fewer than n
    * tokens. Same per-row array-expression shape as [[wordBigrams]] —
    * codegen'd, no UDF, no shuffle. Used by cross-document boilerplate
    * detection (q55) and n-gram decontamination (q56), where the grams
    * are hashed before any shuffle so only 16-byte keys move.
    *
    * Built as a fold of zip_with over n shifted slices rather than a
    * transform over positions: the old `slice(t, i, n)` sat inside the
    * lambda, where subexpression elimination cannot reach, so
    * split(text) re-ran once per GRAM (~|tokens| times per row — the
    * whole gram/winnow family's hot path). As HOF arguments the n
    * slices evaluate the token array n times per ROW, and every
    * lambda touches only its own variables. Gram strings identical. */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    // linear fold of zip_with over shifted slices. A doubling
    // composition (k-grams from (k/2)-grams) was measured SLOWER
    // head-to-head at 1M docs (n=8: 11.3 s vs the fold's 9.7 s;
    // duplicated argument subtrees are not CSE'd across zip_with
    // arguments, and the intermediate slice copies outweigh the
    // saved string churn) — the fold is the measured winner at both
    // n=4 (3.4× over the old form) and n=8 (1.65×)
    val m = greatest(size(t) - lit(n - 1), lit(0))
    val grams = (2 to n).foldLeft(slice(t, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(t, lit(k), m), (a, b) => concat_ws(" ", a, b))
    }
    when(size(t) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Non-overlapping `n`-word chunk list (space-joined, trailing partial
    * chunk included) — the unit of chunk-level dedup (q60), the
    * line/paragraph-dedup family for a corpus whose documents carry no
    * newlines. Pure per-row array expression; chunk i covers tokens
    * [i*n+1, i*n+n].
    *
    * Audit note (SCALE.md lesson #5): `t` is referenced inside the
    * lambda, so split re-runs once per CHUNK — a bounded ⌈tokens/n⌉
    * multiplier (≈7 at n=8), not the per-gram ~|tokens| that made
    * wordNgrams hot; the strided starts have no zip_with equivalent,
    * so the simple form stays until a profile says otherwise. */
  def wordChunks(text: Column, n: Int): Column = {
    val t = tokens(text)
    transform(
      sequence(lit(0), ceil(size(t) / lit(n.toDouble)).cast("int") - 1),
      i => array_join(slice(t, i * n + 1, lit(n)), " "))
  }

  /** Repeated-bigram ratio in [0,1] — the "repetition" quality signal
    * (high values flag boilerplate/spam; the duplicated-n-gram-fraction
    * family of filters used in large-corpus curation): 1 − distinct/
    * total word bigrams, 0 for docs with fewer than 2 tokens. Pure
    * per-row array arithmetic, no shuffle, engine-exact (int-derived
    * doubles, one IEEE division). */
  def repetitionRatio(text: Column): Column = {
    val bg = wordBigrams(text)
    when(tokenCount(text) < 2, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(bg)).cast("double") /
          size(bg).cast("double"))
  }

  /** Maximum single-token frequency of the doc — the "most repeated
    * word" numerator of Gopher-style repetition rules. Pure per-row
    * array arithmetic (O(distinct·n) per row, bounded by doc length),
    * no shuffle. */
  def maxTokenFreq(text: Column): Column = {
    // longest run in the SORTED token array == max token frequency.
    // The old form — filter(t, x => x === d) inside a transform over
    // array_distinct(t) — referenced t inside a lambda, where
    // subexpression elimination cannot reach: split(text) re-ran per
    // distinct element (O(distinct · n · |text|) per row). As a fold
    // over one sorted HOF argument the array evaluates once per row
    // and the lambda touches only its own variables.
    val s = array_sort(tokens(text))
    aggregate(
      s,
      struct(lit(0).as("best"), lit(0).as("cur"),
        lit(null).cast("string").as("prev")),
      (acc, x) => {
        val cur = when(acc("prev").isNull || acc("prev") =!= x, lit(1))
          .otherwise(acc("cur") + 1)
        struct(greatest(acc("best"), cur).as("best"), cur.as("cur"),
          x.as("prev"))
      },
      acc => acc("best"))
  }

  /** Gopher-family quality rules (Rae et al. 2021 §A.1.1, thresholds
    * adapted to the synthetic corpus so each rule splits it), all
    * integer comparisons — engine-exact:
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3.9, 5.1] — cross-multiplied:
    *    39·nw ≤ 10·nchars ≤ 51·nw (nchars = non-space chars)
    *  - ≥ 2 distinct required stopwords present
    *  - most-repeated token ≤ 20 % of tokens (5·maxtf ≤ nw)
    * Returns the four boolean rule columns; callers census or filter. */
  def gopherFlags(text: Column, minWords: Int, maxWords: Int)
      : Seq[(String, Column)] = {
    val t = tokens(text)
    val nw = size(t)
    val nchars = length(regexp_replace(text, " ", ""))
    val stopHits = size(filter(array_distinct(t),
      x => EnStopwords.map(w => x === w).reduce(_ || _)))
    Seq(
      "r_wordcount" -> (nw >= minWords && nw <= maxWords),
      "r_meanwordlen" -> (nchars * 10 >= nw * 39 && nchars * 10 <= nw * 51),
      "r_stopwords" -> (stopHits >= 2),
      "r_repetition" -> (maxTokenFreq(text) * 5 <= nw))
  }

  /** Deflate compression ratio (compressed bytes / raw UTF-8 bytes) —
    * the Gopher/RefinedWeb quality signal: machine-generated or
    * heavily templated text compresses far below prose, random bytes
    * compress above 1.0. Deterministic for a fixed level+strategy on
    * the JVM, but NOT oracle-portable (the SQL oracle has no zlib),
    * so this carries a spec, not a query. A UDF is the honest tier
    * here ([[graft.operators.Enrich]] precedent): the kernel is
    * byte-level zlib, inexpressible as Catalyst expressions. Narrow
    * per-row map — no shuffle, no state; at 100 TB it rides the same
    * scan as the other quality signals. */
  val deflateRatio = udf { (s: String) =>
    if (s == null || s.isEmpty) None
    else {
      val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, false)
      try {
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        Some(total.toDouble / raw.length)
      } finally d.end()
    }
  }
}
