package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact per-group ranks WITHOUT a single-task-per-group window sort —
  * the grouped generalization of [[WeightedSample.withCumWeight]]'s
  * two-phase range-partitioned scan, built for the exact-median /
  * exact-percentile rank-filter family (q39/q147/q177/q194).
  *
  * `Window.partitionBy(group).orderBy(value)` puts EVERY row of a
  * group into one task's sort: with a handful of sources over 100 TB
  * that is a guaranteed straggler (the "documented q39 cost class").
  * Here instead:
  *
  *   1. range-partition by (group, orderCols…) into `buckets` tasks —
  *      a group's rows spread over many buckets, each bucket sorting
  *      only ~|data|/buckets rows;
  *   2. per-bucket local ranks via a window partitioned by
  *      (bucket, group) — bucket-bounded sorts, never group-bounded;
  *   3. per-(bucket, group) row counts — at most buckets × |groups|
  *      rows — collect to the driver, fold into per-bucket starting
  *      offsets and per-group totals, broadcast back as a join.
  *
  * Global rank = local rank + offset, exact because range partitioning
  * makes bucket id monotone in (group, orderCols…): every row ordered
  * before bucket b's rows sits in a bucket < b. The orderCols must be
  * a TOTAL order within each group (include a unique tiebreak id, as
  * the rank-filter queries already do for oracle determinism) and all
  * key columns must be non-null.
  *
  * The checkpoint pins one physical layout for both actions (the
  * counts collect and the returned frame) — without it AQE may re-plan
  * the range exchange per action with different sampled boundaries,
  * silently shifting rows between buckets whose offsets were computed
  * under the other layout (withCumWeight's documented hazard). */
object GroupedRank {

  /** df ++ (`rn`: exact 1-based rank within `groupCol` ordered by
    * `orderCols`, `cnt`: group size), both LongType. */
  def withRank(df: DataFrame, groupCol: String, orderCols: Seq[String],
               buckets: Int = 32): DataFrame =
    twoPhase(df, groupCol, orderCols, buckets,
      localCol = w => row_number().over(w),
      bucketAgg = count(lit(1)),
      outCol = "rn", totalCol = "cnt")

  /** df ++ (`cum`: exact INCLUSIVE per-group prefix sum of `weightCol`
    * (LongType) under the `orderCols` order, `gtotal`: per-group total)
    * — the grouped generalization of
    * [[WeightedSample.withCumWeight]], for per-stream byte/token
    * budget splits (shard assignment, packing censuses) that must
    * never fall back to a single-task-per-group window sort. */
  def withCumSum(df: DataFrame, groupCol: String, orderCols: Seq[String],
                 weightCol: String, buckets: Int = 32): DataFrame =
    twoPhase(df, groupCol, orderCols, buckets,
      localCol = w => sum(col(weightCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      bucketAgg = sum(col(weightCol)),
      outCol = "cum", totalCol = "gtotal")

  /** Shared two-phase skeleton: `localCol` builds the running window
    * column from the (bucket, group)-partitioned `orderCols`-ordered
    * spec; `bucketAgg` the per-(bucket, group) contribution whose
    * per-group running total becomes each bucket's starting offset.
    * Exactness argument as in the scaladoc above. */
  private def twoPhase(df: DataFrame, groupCol: String,
                       orderCols: Seq[String], buckets: Int,
                       localCol: org.apache.spark.sql.expressions.WindowSpec
                         => org.apache.spark.sql.Column,
                       bucketAgg: org.apache.spark.sql.Column,
                       outCol: String, totalCol: String): DataFrame = {
    val ranged = df
      .repartitionByRange(buckets, (groupCol +: orderCols).map(col): _*)
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("_rl",
      localCol(Window.partitionBy(col("_b"), col(groupCol))
        .orderBy(orderCols.map(col): _*)))
    val counts = ranged.groupBy(col("_b"), col(groupCol))
      .agg(bucketAgg.as("_n"))
    // bounded driver state: ≤ buckets × |groups| rows, the same budget
    // class as withCumWeight's per-bucket totals
    val collected = counts.collect()
    val groupField = counts.schema(groupCol)
    val outRows = collected.groupBy(_.get(1)).valuesIterator.flatMap {
      rs =>
        val sorted = rs.sortBy(_.getInt(0))
        val total = sorted.iterator.map(_.getLong(2)).sum
        var acc = 0L
        sorted.map { r =>
          val o = Row(r.getInt(0), r.get(1), acc, total)
          acc += r.getLong(2)
          o
        }
    }.toSeq
    val schema = StructType(Seq(
      StructField("_b", IntegerType, nullable = false),
      groupField,
      StructField("_off", LongType, nullable = false),
      StructField(totalCol, LongType, nullable = false)))
    val offs = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(outRows: _*), schema)
    local.join(broadcast(offs), Seq("_b", groupCol))
      .withColumn(outCol, col("_rl").cast("long") + col("_off"))
      .drop("_b", "_rl", "_off")
  }
}
