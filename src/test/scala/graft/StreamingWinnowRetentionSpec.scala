package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Dedup, Retention}
import graft.streaming.{StreamingWinnowRetention, StreamingWinnowScreen}

/** The retention twin certified: the LIVE keep/drop snapshot (online
  * coPairs evidence → confirmed pairs → CC → the factored
  * [[Retention]] policy) equals q238's from-scratch batch policy on
  * everything ingested, after EVERY micro-batch, for ascending and
  * out-of-order slicings — with a brand-new query per slice against
  * the same checkpoints (bucket-state RECOVERY, not just continuity),
  * exactly the StreamingWinnowCcSpec discipline. Plus the claim that
  * makes the twin worth having: a keep decision FLIPS live when a
  * better copy arrives later. */
class StreamingWinnowRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  // family 1–2–3 chained by two 12-token spans (doc 2 is the longest
  // ⇒ highest quality ⇒ the family's final winner), pair 4–5 (equal
  // text length ⇒ tie ⇒ lower id 4 wins), loner 6, and a 21-doc
  // banner flood that must saturate the online df-cap exactly like
  // the batch cap
  private val banner = words("legal", 12)
  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, "web", "alpha " + words("spanA", 12)),
    (2L, "web", words("spanA", 12) + " " + words("spanB", 12)),
    (3L, "arxiv", words("spanB", 12) + " gamma"),
    (4L, "web", "delta " + words("spanC", 12)),
    (5L, "arxiv", words("spanC", 12) + " epsil"),
    (6L, "web", words("lonely", 12))) ++
    (100L to 120L).map(i => (i, "web", banner + s" tail$i"))

  /** q238's policy from scratch: batch screen (distinct (doc, fp),
    * df-cap [2, DfCap], ≥2 shared fps) → CC → Retention.withKeep. */
  private def batchKeep(rows: Seq[(Long, String, String)])
      : Map[Long, (String, Long, Boolean)] = {
    val df = rows.toDF("doc_id", "source", "text")
    val fd = StreamingWinnowScreen.fingerprintsNarrow(df, "doc_id", "text")
      .select(col("docId"), col("fp")).distinct()
    val usable = fd.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, StreamingWinnowScreen.DfCap))
      .select(col("fp"))
    val capped = fd.join(usable, "fp")
    val edges = capped.select(col("fp"), col("docId").as("doc_a"))
      .join(capped.select(col("fp"), col("docId").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_a"), col("doc_b"))
    val comps =
      if (edges.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_id", "component")
      else Dedup.connectedComponents(edges)
    Retention.withKeep(
        StreamingWinnowRetention.docAttrs(df, "doc_id", "source", "text"),
        comps)
      .select(col("doc_id"), col("source"), col("tokens"), col("keep"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
  }

  private def snapMap(df: DataFrame): Map[Long, (String, Long, Boolean)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap

  /** Runs the two checkpointed streams slice by slice (fresh queries
    * each slice = restart recovery) and returns the live snapshot
    * after each slice, asserting it equals the batch policy. */
  private def runSlicing(tag: String,
                         slices: Seq[Seq[(Long, String, String)]])
      : Seq[Map[Long, (String, Long, Boolean)]] = {
    val d = Files.createTempDirectory(s"graft-swret-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckptAttrs = d.resolve("ckpt-attrs").toString
    val ckptPairs = d.resolve("ckpt-pairs").toString
    val docStore = d.resolve("docs").toString
    val pairLog = d.resolve("pairs").toString

    var ingested = Seq.empty[(Long, String, String)]
    val snaps = Seq.newBuilder[Map[Long, (String, Long, Boolean)]]
    for ((slice, i) <- slices.zipWithIndex) {
      slice.toDF("doc_id", "source", "text")
        .coalesce(1).write.mode("append").parquet(in.toString)
      ingested = ingested ++ slice

      def stream = spark.readStream
        .schema("doc_id LONG, source STRING, text STRING")
        .parquet(in.toString)

      // 1. doc-attrs store (plain append projection)
      val qa = StreamingWinnowRetention
        .docAttrs(stream, "doc_id", "source", "text")
        .writeStream.format("parquet")
        .option("path", docStore)
        .outputMode("append")
        .option("checkpointLocation", ckptAttrs)
        .trigger(Trigger.AvailableNow())
        .start()
      qa.awaitTermination()

      // 2. pair evidence + per-batch snapshot
      var last: Option[Map[Long, (String, Long, Boolean)]] = None
      val qp = StreamingWinnowRetention
        .retentionWriter(stream, "doc_id", "text", pairLog, docStore) {
          snap => last = Some(snapMap(snap))
        }
        .option("checkpointLocation", ckptPairs)
        .trigger(Trigger.AvailableNow())
        .start()
      qp.awaitTermination()

      val live = last.getOrElse(
        snapMap(StreamingWinnowRetention.snapshot(
          spark.read.parquet(docStore), spark.read.parquet(pairLog))))
      val reference = batchKeep(ingested)
      assert(live == reference,
        s"$tag slice $i: live retention snapshot != batch q238 policy")
      snaps += live
    }
    snaps.result()
  }

  test("live keep set equals the batch policy after every slice, and " +
      "a better late copy flips the earlier keep") {
    val snaps = runSlicing("asc", Seq(
      corpus.filter(_._1 == 1L),           // doc 1 alone: kept
      corpus.filter(t => t._1 >= 2 && t._1 <= 5),
      corpus.filter(_._1 > 5)))            // loner + banner flood
    assert(snaps(0)(1L)._3, "doc 1 must be kept while it is the only copy")
    assert(!snaps(1)(1L)._3 && snaps(1)(2L)._3,
      "doc 2 (longer, higher quality) must take over the family live")
    assert(!snaps(1)(3L)._3, "doc 3 rides the chained component")
    assert(snaps(1)(4L)._3 && !snaps(1)(5L)._3,
      "4–5 tie breaks to the lower id")
    // banner flood saturates the online cap: every banner doc must
    // stay kept (no pair evidence may come from a saturated bucket)
    val fin = snaps(2)
    assert((100L to 120L).forall(fin(_)._3),
      "saturated boilerplate must not cluster")
    assert(fin(6L)._3, "loner kept")
  }

  test("parity holds for out-of-order arrival (banner flood first)") {
    val snaps = runSlicing("desc", Seq(
      corpus.filter(_._1 >= 100),          // saturation before content
      corpus.filter(t => t._1 >= 3 && t._1 < 100),
      corpus.filter(_._1 < 3)))            // chain closes last
    val fin = snaps.last
    assert(Seq(1L, 3L).forall(id => !fin(id)._3) && fin(2L)._3,
      "family winner independent of arrival order")
  }
}
