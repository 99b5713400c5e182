package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Streaming connected components — the live capstone of the
  * incremental family (q96 pairs, q173 chunks, q191 KMV, q127
  * SemDedup, q212 batch incremental CC): [[StreamingNearDup]]'s
  * stateful band-hub stage maintains the similarity graph across
  * micro-batches, and the component fixpoint runs batch-side over the
  * emitted edge log, exactly as q212's stored-artifact pipeline
  * persists edges between batches.
  *
  * The certification here is q212's, made slicing-universal: for EVERY
  * tested slicing of the real documents table into micro-batches —
  * including one that arrives in descending id order — the component
  * map computed from the streamed edges equals the from-scratch batch
  * map over everything ingested so far, after every single slice. The
  * batch reference re-derives band keys, star edges and CC from
  * nothing each time, so the equality certifies incremental == batch,
  * not incremental == incremental. */
class StreamingCcSpec extends SparkSpec {

  private def docsAll: DataFrame = Tables.documents(spark, sf())
    .filter(col("doc_id") < 120)
    .select(col("doc_id"), col("text"))

  /** From-scratch batch component map of `docs` (q40/q212's kernel):
    * LSH band keys → star edges → exact CC fixpoint. */
  private def batchComponents(docs: DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(
        Dedup.lshStarEdgesFrom(
          Dedup.lshBandKeysNarrow(docs, "doc_id", "text", 5, 8, 2),
          "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def runSlicing(tag: String,
                         slices: Seq[DataFrame => DataFrame]): Unit = {
    val d = Files.createTempDirectory(s"graft-scc-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    var ingested: Option[DataFrame] = None
    for ((slice, i) <- slices.zipWithIndex) {
      val part = slice(docsAll)
      // parquet file source: no delimiter/quoting hazards with real text
      part.coalesce(1).write.mode("append").parquet(in.toString)
      ingested = Some(ingested.fold(part)(_.union(part)))

      // a BRAND-NEW query object per slice against the same checkpoint:
      // every slice after the first exercises bucket-hub state RECOVERY,
      // not just continuity (the StreamingNearDupSpec restart argument)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = StreamingNearDup.starEdges(stream, "doc_id", "text",
          n = 5, k = 8, bands = 2)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val edges = spark.read.parquet(out)
        .select(col("doc_a"), col("doc_b"))
      val streamed = Dedup.connectedComponents(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val reference = batchComponents(ingested.get)
      assert(streamed == reference,
        s"$tag slice $i: streamed CC != from-scratch batch CC")
      if (i == slices.size - 1)
        assert(streamed.nonEmpty, s"$tag: corpus produced no clusters")
    }
  }

  test("component map equals the from-scratch batch map after every slice") {
    runSlicing("asc", Seq(
      _.filter(col("doc_id") < 40),
      _.filter(col("doc_id") >= 40 && col("doc_id") < 80),
      _.filter(col("doc_id") >= 80)))
  }

  test("parity holds for descending (out-of-order) arrival too") {
    // high ids first: buckets keep their FIRST-SEEN hub, which is not
    // the global min — components must still match, because every
    // member links to the same stored hub and CC labels by min member
    runSlicing("desc", Seq(
      _.filter(col("doc_id") >= 80),
      _.filter(col("doc_id") >= 40 && col("doc_id") < 80),
      _.filter(col("doc_id") < 40)))
  }
}
