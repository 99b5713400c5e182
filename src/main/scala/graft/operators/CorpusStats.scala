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
    * 1-row total are the only broadcasts.
    *
    * The final ×10⁴ flooring runs in DECIMAL(38,0) with an integral
    * `div` (quotient ≤ 10⁴, so the BIGINT result never overflows):
    * num·10⁴ reaches 2·s·T·10⁴ ≈ 10²⁹ at a 10-TB-scale source, far
    * past BIGINT but comfortably inside decimal(38) — and DuckDB's
    * HUGEINT `//` on the oracle side is the same exact floor. The
    * per-term BIGINT products o·T cap out later (o·T ≤ s·T ≈ 9·10¹⁸
    * at s ≈ 10⁶, T ≈ 10¹³); shard sources before that point. */
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
        expr("""(cast(obs as decimal(38,0))
              + cast(s as decimal(38,0)) * (cast(t as decimal(38,0))
                  - cast(cobs as decimal(38,0))))
            * 10000
          div (2 * cast(s as decimal(38,0)) * cast(t as decimal(38,0)))""")
          .cast("long").as("tvd_x1e4"))
      .orderBy(col("source"))
  }
}
