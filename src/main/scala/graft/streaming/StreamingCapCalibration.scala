package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming twin of q250's screen-cap calibration — the
  * duplication-aware df-cap recomputed LIVE as crawl batches arrive,
  * so the online screen's threshold tracks the corpus instead of
  * trusting a constant chosen at deploy time (the r11 finding: a
  * fixed cap silently drops real duplicate families as duplication
  * grows; a crawl's duplication RATE drifts batch to batch, so the
  * cap must be a stream, not a config value).
  *
  * Composition: one checkpointed stream appends (doc_id, md5(text))
  * to a hash store — per-row projections only, append-mode-legal —
  * and each micro-batch re-reads the store and emits the current
  * adaptive cap ceil(DfCap · distinct docs / distinct text hashes),
  * the exact q250 formula (integer ceil-division, engine-exact). The
  * emitted cap feeds [[StreamingWinnowScreen.coPairs]]' `dfCap` /
  * [[StreamingWinnowRetention.deltaWriter]] on the NEXT deployment
  * cadence — a cap change rebuilds screen state by design (the cap
  * defines which evidence is boilerplate; changing it mid-state would
  * mix two policies).
  *
  * Replay discipline: foreachBatch is at-least-once, so BOTH counts
  * are duplicate-insensitive distincts over the store (a replayed
  * batch appends its rows twice; `count_distinct` absorbs it) — the
  * same idempotent-downstream rule as the retention pair log.
  *
  * 100 TB posture: the store carries 8-byte ids + 16-byte hashes,
  * never text; the per-batch recount is two distincts over the store
  * (shuffle on hash prefixes). A production deployment swaps the
  * exact distincts for the mergeable KMV sketch (StreamingKmv) and a
  * running count — this exact twin is the oracle-checkable policy
  * definition, spec-pinned equal to the batch formula per prefix. */
object StreamingCapCalibration {

  val storeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("h", StringType)))

  /** Per-arrival (doc_id, text-hash) — per-row projections only. */
  def docHashes(docs: DataFrame, idCol: String,
                textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("h"))

  /** The current adaptive cap from the accumulated store —
    * ceil(DfCap · n / m) over DISTINCT docs and hashes (replay-proof;
    * q250's exact integer formula). DfCap when the store is empty. */
  def capFromStore(spark: SparkSession, storePath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    val base = StreamingWinnowScreen.DfCap.toLong
    if (!hasData) return base
    val r = spark.read.schema(storeSchema).parquet(storePath)
      .agg(count_distinct(col("doc_id")).as("n"),
        count_distinct(col("h")).as("m")).head()
    val (n, m) = (r.getLong(0), r.getLong(1))
    if (m == 0L) base else (base * n + m - 1L) / m
  }

  /** The live composition: hashes land in `storePath` per micro-batch
    * and `onCap` receives (current adaptive cap, batchId) after each.
    * Caller adds checkpointLocation/trigger and starts. */
  def capWriter(docs: DataFrame, idCol: String, textCol: String,
                storePath: String)(onCap: (Long, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docHashes(docs, idCol, textCol).writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        b.write.mode("append").parquet(storePath)
        onCap(capFromStore(b.sparkSession, storePath), batchId)
      }
}
