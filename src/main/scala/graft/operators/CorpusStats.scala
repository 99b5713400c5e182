package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition statistics for training-data mixing: per-source
  * unigram-distribution divergence from the whole corpus — the
  * diagnostic that tells a mixture designer which sources are
  * distributionally redundant vs distinctive (the readout side of
  * q94's domain-mixture sampler).
  *
  * Scale: one explode of tokens → two hash-aggs (per-(source,term) and
  * per-term) → a term-keyed equi-join whose right side is |vocab| rows
  * (broadcastable) → a |sources|-row census. Nothing here is
  * proportional to the corpus after the first agg.
  */
object CorpusStats {

  /** Per-source total-variation distance to the corpus unigram
    * distribution, fixed-point ×10⁴:
    *
    *   tvd = ½ · Σ_t |o_t/s − c_t/T|
    *       = Σ_t |o_t·T − c_t·s| / (2·s·T)
    *
    * computed as exact BIGINT cross-multiplication per term, one
    * integer division at the end — engine-exact. The ×10⁴ scale keeps
    * the numerator Σ·10⁴ ≤ 2·s·T·10⁴ inside BIGINT up to s·T ≈ 9·10¹⁴
    * (sf1 is ~10¹³); past that, split the flooring as
    * q = Σ div d; r = Σ − q·d; tvd = q·10⁴ + r·10⁴ div d.
    * Terms absent from a source count at full corpus mass (the
    * LEFT join from the per-term side keeps them). */
  def sourceUnigramTvd(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("term"))
    val bySourceTerm = toks.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("o"))
    val byTerm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bySource = bySourceTerm.groupBy(col("source"))
      .agg(sum(col("o")).as("s"))
    val total = byTerm.agg(sum(col("c")).as("t"))
    // full (source × term) grid so terms a source never emits still
    // contribute |0 − c·s|: cross the |sources| census with the
    // |vocab| term table (both tiny post-agg), then left-join observed
    bySource.crossJoin(broadcast(byTerm))
      .join(bySourceTerm, Seq("source", "term"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("s"), col("t"))
      .agg(sum(abs(col("o") * col("t") - col("c") * col("s"))).as("num"))
      .select(col("source"), col("s").as("n_tokens"),
        expr("num * 10000 div (2 * s * t)").as("tvd_x1e4"))
      .orderBy(col("source"))
  }
}
