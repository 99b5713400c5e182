package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log anonymization — the parallel-safe redesign of the reference's
  * inherently sequential rewriter (`/root/reference/tools/
  * log_anonymizer.py:139-224`: global first-seen counters + value→alias
  * maps). Two modes (SURVEY §2.9):
  *
  *  - [[keyedAliases]]: alias = prefix + stable hash of the value.
  *    Embarrassingly parallel, no state, no shuffle; aliases are stable
  *    across runs and datasets (the right default at 100 TB).
  *
  *  - [[denseAliases]]: two-pass — distinct values get dense numbers via
  *    a window over a deterministic ordering, broadcast back. Preserves
  *    the reference's dense numbering but orders by value, not by
  *    first-seen file position (which has no parallel meaning;
  *    documented divergence, SURVEY §7.4.8).
  */
object Anonymize {

  /** Stateless stable alias: `ip_3f2a...` (first 10 md5 hex chars). */
  def keyedAlias(value: Column, prefix: String): Column =
    concat(lit(prefix), lit("_"), substring(md5(value), 1, 10))

  def keyedAliases(df: DataFrame, column: String, prefix: String): DataFrame =
    df.withColumn(column, keyedAlias(col(column), prefix))

  /** Dense numbering: value → `prefix_N` with N = 1..distinct-count,
    * assigned in value sort order. Distributed throughout: orderBy is a
    * range-partitioned sort and zipWithIndex numbers partitions by
    * offset — a partitionless `row_number()` window would funnel every
    * distinct value through ONE task, the classic dense-rank scale bug.
    * The mapping is broadcast back; for mappings too large to broadcast,
    * drop the hint and let AQE shuffle-join. */
  def denseAliases(df: DataFrame, column: String, prefix: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(column)).distinct().orderBy(col(column))
    val indexed = distinct.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), s"${prefix}_${i + 1}")
    }
    val mapping = spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(Seq(
        distinct.schema.head,
        org.apache.spark.sql.types.StructField("_alias",
          org.apache.spark.sql.types.StringType, nullable = false))))
    df.join(broadcast(mapping), Seq(column), "left")
      .withColumn(column, col("_alias"))
      .drop("_alias")
  }

  /** The reference's pattern set, reduced to the engine-relevant ones:
    * anonymize ip + user columns of an events frame. */
  def anonymizeEvents(events: DataFrame): DataFrame =
    keyedAliases(
      keyedAliases(events, "ip", "ip"),
      "user", "user")
}
