package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-weighted domain mixing — the "rebalance the corpus by
  * source/language before training" operator (the α-temperature
  * sampling of multilingual-model data pipelines: a domain with share
  * p is drawn with probability ∝ p^α, α<1 upsampling rare domains
  * relative to dominant ones). Deterministic and engine-exact:
  *
  *  - Per-domain weight w = ⌊n^α · 10⁶⌋ as an INTEGER. For the exact
  *    regimes α ∈ {0, 0.5, 1} every step is reproducible across
  *    engines (n is exact in double below 2^53, IEEE sqrt is correctly
  *    rounded, one deterministic rounding in the 10⁶ scale, floor is
  *    exact) — so the q94 DuckDB oracle hash-matches. Other α go
  *    through libm `pow`, which is NOT correctly rounded — allowed,
  *    but documented engine-local.
  *  - Inclusion P(keep | domain s) = min(1, T·w_s / (W·n_s)) for a
  *    target total T, decided WITHOUT EVER DIVIDING: keep iff
  *    u · n_s · W  <  T · w_s · 2³²  where u is the md5-derived 32-bit
  *    uniform of [[WeightedSample.uniform32]]. Both sides are exact
  *    integer products (DECIMAL(38,0) here, HUGEINT in the oracle), so
  *    no rounding can flip a near-tie — the same no-float contract as
  *    poissonInclude/systematicPps. Headroom: u·n·W ≤ 2³²·N·(D·10⁶·√N)
  *    < 10³⁸ up to N ≈ 10¹² docs across D ≈ 100 domains.
  *
  * Scale shape: one partial-aggregated groupBy over the corpus for the
  * per-domain counts (tiny result), broadcast back, then a NARROW
  * filter — no shuffle of the corpus itself, same cost class as a
  * WHERE clause. Domains with rate ≥ 1 keep everything (the min(1,·)
  * is implicit in the comparison); E[kept] then lands below T, which
  * is the standard temperature-sampling behavior (quota moves to the
  * capped domains, re-run with a larger T if exact totals matter).
  *
  * Reference analog: none (the reference reports full counts only);
  * beyond-reference family of q53/q68/q69.
  */
object MixtureSample {

  private val Scale = 1L << 32

  /** ⌊n^α · 10⁶⌋ as a long; α ∈ {0, 0.5, 1} are engine-exact. */
  def weightScaled(n: Column, alpha: Double): Column = alpha match {
    case 0.0 => lit(1000000L)
    case 0.5 => floor(sqrt(n.cast("double")) * 1e6).cast("long")
    case 1.0 => n.cast("long") * lit(1000000L)
    case a   => floor(pow(n.cast("double"), a) * 1e6).cast("long")
  }

  /** Rows of `df` kept by the α-temperature mixture over `domain`,
    * targeting ≈`target` total rows. `id` must be unique (the hash
    * seed input). Adds nothing, drops nothing but rows. */
  def temperatureSample(df: DataFrame, domain: String, id: String,
                        target: Long, alpha: Double,
                        seed: String): DataFrame =
    temperatureSampleWith(df, domainStats(df, domain, alpha),
      domain, id, target, seed)

  /** The keep rule against a PRECOMPUTED stats table — the streaming
    * ingest shape: freeze the mixture policy on the historic corpus
    * (one [[domainStats]] batch pass), then apply it to arriving rows
    * as a stream-static broadcast join + stateless filter (append-mode
    * legal; per-row decision depends only on the row's id hash and the
    * frozen stats, so stream == batch for any slicing). */
  def temperatureSampleWith(df: DataFrame, stats: DataFrame,
                            domain: String, id: String,
                            target: Long, seed: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    df.join(broadcast(stats), Seq(domain))
      .filter(
        dec(WeightedSample.uniform32(seed, col(id))) * dec(col("_n")) *
          dec(col("_wtot")) <
        dec(lit(target)) * dec(col("_w")) * dec(lit(Scale)))
      .drop("_n", "_w", "_wtot")
  }

  /** Per-domain (domain, _n, _w, _wtot): count, scaled weight, and the
    * global weight total replicated per row. The unpartitioned window
    * funnels through ONE task — fine here because the frame is one row
    * per DOMAIN (the corpus was already reduced by the groupBy). */
  def domainStats(df: DataFrame, domain: String, alpha: Double): DataFrame =
    df.groupBy(col(domain)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", weightScaled(col("_n"), alpha))
      .withColumn("_wtot", sum(col("_w")).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
}
