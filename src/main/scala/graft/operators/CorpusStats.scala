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
    * integer division at the end — engine-exact. Terms a source never
    * emits NEVER materialize: their combined mass has the closed form
    * Σ_{t∉src} c_t·s = s·(T − Σ_{t∈src} c_t), so the numerator is
    *
    *   num = Σ_{t∈src} |o_t·T − c_t·s| + s·(T − Σ_{t∈src} c_t)
    *
    * and the whole computation is two hash-aggs plus a term-keyed
    * equi-join on OBSERVED (source, term) pairs — no sources×vocab
    * grid, no vocab-sized broadcast, open-vocabulary-safe (the
    * ScaleBench corpus has ~60M distinct terms at 1M docs and this
    * still runs as one shuffle join). The |sources| census and the
    * 1-row total are the only broadcasts. The ×10⁴ scale keeps the
    * numerator Σ·10⁴ ≤ 2·s·T·10⁴ inside BIGINT up to s·T ≈ 9·10¹⁴
    * (sf1 is ~10¹³); past that, split the flooring as
    * q = Σ div d; r = Σ − q·d; tvd = q·10⁴ + r·10⁴ div d. */
  def sourceUnigramTvd(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("term"))
    val bySourceTerm = toks.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("o"))
    val byTerm = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val bySource = bySourceTerm.groupBy(col("source"))
      .agg(sum(col("o")).as("s"))
    val total = byTerm.agg(sum(col("c")).as("t"))
    bySourceTerm
      .join(byTerm, Seq("term"))
      .join(broadcast(bySource), Seq("source"))
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("s"), col("t"))
      .agg(sum(abs(col("o") * col("t") - col("c") * col("s"))).as("obs"),
        sum(col("c")).as("cobs"))
      .select(col("source"), col("s").as("n_tokens"),
        expr("(obs + s * (t - cobs)) * 10000 div (2 * s * t)")
          .as("tvd_x1e4"))
      .orderBy(col("source"))
  }
}
