package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The scale-path storage layout for the events table (SURVEY §7.4.9):
  * parquet partitioned by event day (and optionally server) instead of
  * the reference's single append-only CSV.
  *
  * Why this layout at 100 TB:
  *  - the daily report's `today` filter becomes partition pruning — the
  *    scan touches one partition, not the whole table (the reference
  *    re-reads the entire CSV per report, report.py:92-93);
  *  - appends are new files in new partitions — no read-modify-write;
  *  - parquet column pruning means count/top-k aggregations read only
  *    the grouped columns.
  *
  * The partition column is derived from the parity `date` string
  * ("dd/MM/yyyy HH:mm") and stored as ISO `day=yyyy-MM-dd`.
  */
object EventsTable {

  val PartitionCol = "day"

  def withDay(events: DataFrame): DataFrame =
    events.withColumn(PartitionCol,
      date_format(to_timestamp(col("date"), "dd/MM/yyyy HH:mm"), "yyyy-MM-dd"))

  def append(events: DataFrame, path: String,
             alsoByServer: Boolean = false): Unit = {
    val cols = if (alsoByServer) Seq(PartitionCol, "server")
    else Seq(PartitionCol)
    withDay(events).write
      .partitionBy(cols: _*)
      .mode(SaveMode.Append)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One day's slice — must plan as a PartitionFilters-only scan (no
    * data filter, no full-table listing of row groups). */
  def day(spark: SparkSession, path: String, isoDay: String): DataFrame =
    read(spark, path).filter(col(PartitionCol) === isoDay)

  /** Bucketed catalog table: pre-shuffles once at write time so that
    * repeated fact-fact joins/aggregations on `keyCols` are co-located —
    * zero Exchange at read time (asserted in TableSinksSpec). The 100-TB
    * pattern for tables joined on the same key every day. Bucketing
    * requires the catalog (saveAsTable), not a bare path. */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
                    keyCols: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(tableName)
}
