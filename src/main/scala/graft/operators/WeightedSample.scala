package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling — data mixing for training runs
  * where "sample 10M docs, probability proportional to token count"
  * must give the SAME sample on every run, engine, and partitioning
  * (Spark's `sample()` is none of those; q53's stratified buckets are
  * uniform within a stratum). Two modes, both in pure integer
  * arithmetic so a DuckDB oracle can hash-match them exactly — no
  * float `pow`/`ln` whose last-ulp differences across libm
  * implementations could flip a near-tie:
  *
  *  - [[poissonInclude]]: independent Bernoulli with inclusion
  *    probability w/wMax. The per-row uniform is the first 8 hex
  *    chars of md5(seed||id) read as a 32-bit int; include iff
  *    u·wMax < w·2^32. Narrow filter, no shuffle — the 100 TB default.
  *  - [[systematicPps]]: classic systematic probability-proportional-
  *    to-size sampling (fixed stride over the cumulative weight line):
  *    row included iff ⌊cum·k/W⌋ > ⌊(cum−w)·k/W⌋ — EXACTLY k rows,
  *    every row with w ≥ W/k guaranteed in (the Horvitz–Thompson
  *    workhorse). Needs a global prefix sum over the id order; done
  *    scale-correctly in two phases (below), not one giant window.
  *
  * Prefix-sum shape: a single `Window.orderBy(id)` puts the whole
  * corpus in ONE task. Instead [[withCumWeight]] range-partitions by
  * id, takes a per-partition running sum (window PARTITIONED by the
  * range bucket), and adds each bucket's starting offset computed from
  * the tiny per-bucket totals (collected — one row per bucket, not per
  * data row). The result is the global prefix sum, identical for ANY
  * bucket count — WeightedSampleSpec asserts partitioning-invariance.
  *
  * Reference analog: none (the reference reports full counts only);
  * beyond-reference surface like q53/q58.
  */
object WeightedSample {

  private val Scale = 1L << 32 // md5 prefix width: 8 hex chars

  /** 32-bit uniform from md5(seed || ':' || id) — the q41/q53 bucket
    * trick widened to an integer so it can scale by a weight. 8 hex
    * chars (not more) keeps u·wMax < 2^53, so even an engine that
    * folds the hex digits in doubles stays exact. */
  def uniform32(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Bernoulli inclusion, P(in) = w/wMax, all-integer comparison. */
  def poissonInclude(seed: String, id: Column, w: Column,
                     wMax: Column): Column =
    uniform32(seed, id) * wMax < w.cast("long") * lit(Scale)

  /** (df ++ cum) where cum is the global prefix sum of `weightCol` in
    * `idCol` order, built as a two-phase distributed scan: range
    * partition → per-bucket running sum → add broadcast bucket offsets.
    *
    * EAGER: the range-partitioned frame is localCheckpoint'd before the
    * per-bucket totals are collected. The bucket id comes from
    * `spark_partition_id()`, and the totals collect and the returned
    * frame are two separate actions — without pinning, AQE may re-plan
    * the range exchange differently per action (different sampled
    * boundaries / coalescing), silently shifting rows between buckets
    * whose offsets were computed under the other layout. The checkpoint
    * makes both actions read one materialized layout. At corpus scale,
    * prefer feeding a frame already bucketed by `idCol` (bucketed table
    * / partitioned layout) so the checkpoint is a metadata no-op.
    */
  def withCumWeight(df: DataFrame, idCol: String, weightCol: String,
                    buckets: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(buckets, col(idCol))
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("_cumLocal",
      sum(col(weightCol)).over(
        Window.partitionBy(col("_b")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // one row per bucket: (bucket, total) -> starting offset via scan
    val totals = local.groupBy(col("_b"))
      .agg(sum(col(weightCol)).as("_t"))
      .orderBy(col("_b"))
      .collect()
    local.withColumn("cum",
        col("_cumLocal") + bucketOffsetCol(totals, col("_b")))
      .drop("_b", "_cumLocal")
  }

  /** Fold collected per-bucket totals ((bucket id: Int, total: Long)
    * rows in bucket order) into the broadcast starting-offset column
    * every two-phase range scan adds to its per-bucket local values —
    * shared by [[withCumWeight]] (prefix sums) and
    * SuffixArray.denseRankBy (dense-rank offsets), so the offset
    * arithmetic cannot diverge between them. */
  private[operators] def bucketOffsetCol(
      totals: Seq[org.apache.spark.sql.Row], bucket: Column): Column = {
    var acc = 0L
    val offsets = totals.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }
    offsets.foldLeft(lit(0L): Column) {
      case (e, (b, off)) => when(bucket === b, lit(off)).otherwise(e)
    }
  }

  /** Systematic PPS: exactly k of the rows, inclusion ∝ weight,
    * deterministic in pure integer arithmetic. Weights must be
    * positive integers (token counts are). */
  def systematicPps(df: DataFrame, idCol: String, weightCol: String,
                    k: Int, buckets: Int = 32): DataFrame = {
    val cum = withCumWeight(df, idCol, weightCol, buckets)
    // total from the pre-cum frame: a cheap partial-agg pass, not a
    // re-execution of the two-phase prefix sum
    val total = df.agg(sum(col(weightCol))).collect()(0).getLong(0)
    cum.filter(
        floor(col("cum") * k / total) >
        floor((col("cum") - col(weightCol)) * k / total))
      .drop("cum")
  }
}
