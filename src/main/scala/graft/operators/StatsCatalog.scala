package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent statistics catalog — the CBO artifact q73 (column
  * profile) and q76 (equi-depth histogram) gesture at, made a real
  * table with a writer/reader API: profiles and histograms land in a
  * parquet catalog partitioned by table name, and a planner (or a
  * data-quality monitor) reads NDV / null counts / bucket boundaries
  * back without touching the profiled data.
  *
  * Layout: `<dir>/profile` and `<dir>/histogram`, both partitioned by
  * `table_name` so a reader scanning one table's stats prunes every
  * other table's partition (and a 100-TB deployment's catalog stays a
  * catalog — thousands of tiny partitioned rows, one per
  * table×column×stat, never data-sized). Refresh is per-partition
  * dynamic overwrite: re-profiling one table replaces ONLY that
  * table's partition, leaving the rest of the catalog untouched —
  * no read-modify-write of the whole catalog, no window where other
  * tables' stats are missing.
  *
  * Schemas:
  *  - profile: ColumnProfile.profile output + table_name
  *    (col_name, n, n_nulls, n_distinct, vmin_num, vmax_num,
  *    vmin_str, vmax_str)
  *  - histogram: (col_name, bucket, n, vmin, vmax) + table_name —
  *    q76's equi-depth shape.
  */
object StatsCatalog {

  private def write(df: DataFrame, path: String, table: String): Unit =
    df.withColumn("table_name", lit(table))
      .repartition(1) // stats are tiny; one file per table partition
      .write
      .partitionBy("table_name")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Persist a [[ColumnProfile.profile]] frame for `table`. */
  def writeProfile(dir: String, table: String, profile: DataFrame): Unit =
    write(profile, s"$dir/profile", table)

  /** Persist an equi-depth histogram (q76 shape: bucket, n, vmin, vmax)
    * for one column of `table`. Types are normalized on write (bucket/n
    * → long, vmin/vmax → double): the catalog root holds every writer's
    * files side by side, and parquet readers refuse mixed INT32/INT64
    * for one column. */
  def writeHistogram(dir: String, table: String, column: String,
                     hist: DataFrame): Unit =
    write(hist
        .withColumn("bucket", col("bucket").cast("long"))
        .withColumn("n", col("n").cast("long"))
        .withColumn("vmin", col("vmin").cast("double"))
        .withColumn("vmax", col("vmax").cast("double"))
        .withColumn("col_name", lit(column)),
      s"$dir/histogram", table)

  /** All stored profile rows for `table` (partition-pruned read). */
  def readProfile(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/profile")
      .filter(col("table_name") === table)
      .drop("table_name")

  /** Stored histogram for one column of `table`. */
  def readHistogram(spark: SparkSession, dir: String, table: String,
                    column: String): DataFrame =
    spark.read.parquet(s"$dir/histogram")
      .filter(col("table_name") === table && col("col_name") === column)
      .drop("table_name", "col_name")

  /** The planner-facing point lookups. */
  def ndv(spark: SparkSession, dir: String, table: String,
          column: String): Option[Long] =
    statLong(spark, dir, table, column, "n_distinct")

  def nullCount(spark: SparkSession, dir: String, table: String,
                column: String): Option[Long] =
    statLong(spark, dir, table, column, "n_nulls")

  /** Histogram bucket boundaries (vmax per bucket, ascending) — what a
    * CBO feeds its selectivity estimate. */
  def histogramBounds(spark: SparkSession, dir: String, table: String,
                      column: String): Seq[Double] =
    readHistogram(spark, dir, table, column)
      .orderBy(col("bucket"))
      .select(col("vmax").cast("double"))
      .collect().map(_.getDouble(0)).toSeq

  private def statLong(spark: SparkSession, dir: String, table: String,
                       column: String, stat: String): Option[Long] =
    readProfile(spark, dir, table)
      .filter(col("col_name") === column)
      .select(col(stat).cast("long"))
      .collect().headOption.map(_.getLong(0))

  // ------------------------------------------------------------------
  // File-level min/max — the data-skipping index a ZOrder (or any
  // clustered) layout exists to tighten: a reader holding a predicate
  // consults these instead of opening every footer.
  // ------------------------------------------------------------------

  /** Per-file min/max of numeric `columns` for the parquet table at
    * `path`: ONE scan grouped by input_file_name (map-side combined —
    * one output row per file×column, never data-sized). */
  def collectFileStats(spark: SparkSession, path: String,
                       columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty)
    require(columns.forall(!_.contains("'")),
      "column names must not contain single quotes (interpolated into stack())")
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"mn_$i"),
        max(col(c)).cast("double").as(s"mx_$i"))
    }
    val rows = columns.zipWithIndex
      .map { case (c, i) => s"'$c', mn_$i, mx_$i" }
      .mkString(", ")
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: columns.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("file",
        s"stack(${columns.length}, $rows) AS (col_name, vmin, vmax)")
  }

  /** Persist file stats for `table` (same per-table refresh contract
    * as profiles/histograms). */
  def writeFileStats(dir: String, table: String, stats: DataFrame): Unit =
    write(stats, s"$dir/filestats", table)

  def readFileStats(spark: SparkSession, dir: String,
                    table: String): DataFrame =
    spark.read.parquet(s"$dir/filestats")
      .filter(col("table_name") === table)
      .drop("table_name")

  /** Files provably irrelevant to `lo <= column <= hi` — the skip
    * list a scan planner subtracts before listing. A file with NULL
    * min/max (all-null column) is never claimed skippable. */
  def skippableFiles(spark: SparkSession, dir: String, table: String,
                     column: String, lo: Double, hi: Double): Seq[String] =
    readFileStats(spark, dir, table)
      .filter(col("col_name") === column &&
        col("vmin").isNotNull && col("vmax").isNotNull &&
        (col("vmax") < lo || col("vmin") > hi))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
}
