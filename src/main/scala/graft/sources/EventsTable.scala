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

  /** Compact one day partition in place: streaming sinks append a file
    * per micro-batch, and a hot day accumulates thousands of small
    * files (the #1 operational failure of directory tables at scale —
    * listing and open() costs swamp the scan). Rewrites the partition
    * to ceil(bytes/target) files via dynamic partition overwrite, so
    * readers of OTHER days are untouched.
    */
  def compactDay(spark: SparkSession, path: String, isoDay: String,
                 targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val slice = day(spark, path, isoDay)
    val bytes = slice.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (bytes.toLong + targetBytes - 1) / targetBytes).toInt
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // rewrite through a stable snapshot: localCheckpoint materializes
      // the slice before its own source partition is overwritten
      slice.localCheckpoint()
        .repartition(files)
        .write.partitionBy(PartitionCol)
        .mode(SaveMode.Overwrite)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

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
