package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import Queries.Q

/** Round-9 depth queries.
  *
  * Determinism: all-integer arithmetic (ppm grids, `div` on
  * non-negative operands where Spark's truncation and DuckDB's `//`
  * floor agree), the ⌊f(x)·10⁶⌋ quantization recipe for the one sqrt,
  * md5-keyed orders — the suite-wide oracle conventions.
  */
object QueriesRound9 {

  /** TEMPERATURE-SCALED MIXTURE, LONG-TAIL-SAFE — q207's α = 0.5
    * language-sampling census re-derived so the boost survives a
    * 100-language crawl tail: q207 computes
    * boost = w_ppm·10⁶ div p_ppm, and p_ppm = ⌊mass·10⁶/total⌋ is 0
    * for ANY language under one-millionth of corpus tokens — a
    * guaranteed DIVIDE_BY_ZERO on the long tail (loud and symmetric
    * in both engines, so q207 stays for parity; this is the variant a
    * mixture planner actually ships). Here the boost is the exact
    * rational of the RAW masses — boost = (√mass/Σ√)·/(mass/total) =
    * sqrt_fp·total / (Σsqrt_fp·mass) — so the denominator is zero
    * only for a zero-token language, which the CASE guard maps to
    * NULL explicitly (both engines agree on NULL ordering last not
    * needed — langs are the sort key). Sub-ppm languages get their
    * real (large) boost instead of an error, and the un-quantized
    * rational is STRICTLY more precise than q207's ppm-grid ratio.
    *
    * Widths: sqrt_fp·total·10⁶ ≤ 10¹³·10¹⁴·10⁶ = 10³³ and
    * Σsqrt_fp·mass ≤ 10¹⁶·10¹⁴ = 10³⁰ — both inside DECIMAL(38),
    * mirrored by HUGEINT in the oracle.
    *
    * Scale shape: identical to q207 — one partial-agg census to
    * |langs| rows, two bounded broadcast scalars, corpus read once. */
  private val q230 = Q(
    "q230_alpha_mixture_guarded",
    (s, dir) => {
      val lt = Tables.documents(s, dir)
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          floor(sqrt(col("n_tokens").cast("double")) * 1e6)
            .cast("long").as("sqrt_fp"))
      val tot = lt.agg(sum(col("n_tokens")).as("tot"),
        sum(col("sqrt_fp")).as("ssum"))
      lt.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          expr("""CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000
            div tot AS BIGINT)""").as("p_ppm"),
          expr("""CAST(CAST(sqrt_fp AS DECIMAL(38,0)) * 1000000
            div ssum AS BIGINT)""").as("w_ppm"),
          expr("""CAST(CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST(sqrt_fp AS DECIMAL(38,0)) * tot * 1000000
              div (CAST(ssum AS DECIMAL(38,0)) * n_tokens)
            END AS BIGINT)""").as("boost_ppm"))
        .orderBy(col("lang"))
    },
    Some("""WITH lt AS (SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      sq AS (SELECT lang, n_docs, n_tokens,
          CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
            AS sqrt_fp
        FROM lt),
      tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
          CAST(SUM(sqrt_fp) AS BIGINT) AS ssum FROM sq)
      SELECT lang, n_docs, n_tokens,
        CAST(CAST(n_tokens AS HUGEINT) * 1000000 // tot AS BIGINT)
          AS p_ppm,
        CAST(CAST(sqrt_fp AS HUGEINT) * 1000000 // ssum AS BIGINT)
          AS w_ppm,
        CAST(CASE WHEN n_tokens = 0 THEN NULL
          ELSE CAST(sqrt_fp AS HUGEINT) * tot * 1000000
            // (CAST(ssum AS HUGEINT) * n_tokens)
          END AS BIGINT) AS boost_ppm
      FROM sq CROSS JOIN tot ORDER BY lang"""))

  val list: Seq[Q] = Seq(q230)
}
