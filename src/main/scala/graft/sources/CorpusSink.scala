package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curated-corpus writer — the output end of a training-data pipeline:
  * hive-partitioned parquet plus a manifest of per-partition counts.
  *
  * Scale posture:
  *  - `partitionBy` keys (lang/source/…) give partition pruning to every
  *    downstream reader; `maxRecordsPerFile` bounds file sizes so a hot
  *    partition splits instead of producing one multi-GB file.
  *  - dynamic partition overwrite (set per-write, not session-wide)
  *    makes re-running a slice idempotent: only partitions present in
  *    the incoming frame are replaced, the rest of the corpus is
  *    untouched — the batch analog of the streaming sinks' batch-id
  *    idempotence.
  *  - the manifest is a tiny aggregate (|partitions| rows) written
  *    next to the data; readers reconcile counts without scanning.
  */
object CorpusSink {

  /** Write `docs` partitioned by `parts`; returns the manifest frame
    * (partition cols + `n_docs`), which is also written to
    * `dir/_manifest`. */
  def write(docs: DataFrame, dir: String, parts: Seq[String],
            maxRecordsPerFile: Long = 1000000L): DataFrame = {
    docs.write
      .partitionBy(parts: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
    val manifest = docs.groupBy(parts.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(parts.map(col): _*)
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$dir/_manifest")
    manifest
  }
}
