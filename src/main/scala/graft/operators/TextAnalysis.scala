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
}
