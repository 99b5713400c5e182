package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.streaming.StreamingWinnowScreen

/** The two newest twins composed: [[StreamingWinnowScreen]]'s online
  * co-occurrence pairs feed the connected-components fixpoint, and
  * the resulting LIVE component map is certified equal to the batch
  * winnow screen's map (q226's ≥2-shared-fingerprint confirm under
  * the shared df-cap → CC), from scratch, after EVERY micro-batch —
  * the q212/StreamingCcSpec certification transplanted from the LSH
  * band graph to the winnowed span graph. Fresh query per slice
  * (bucket-state RECOVERY, not just continuity) and an out-of-order
  * arrival slicing, exactly the StreamingCcSpec discipline. */
class StreamingWinnowCcSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  // chain 1–2–3 (two distinct 12-token spans), pair 4–5, loner 6,
  // and a 21-doc boilerplate banner family whose fingerprints must
  // saturate the online cap (and fail the batch df-cap identically)
  private val banner = words("legal", 12)
  private val corpus: Seq[(Long, String)] = Seq(
    (1L, "alpha " + words("spanA", 12)),
    (2L, words("spanA", 12) + " " + words("spanB", 12)),
    (3L, words("spanB", 12) + " gamma"),
    (4L, "delta " + words("spanC", 12)),
    (5L, words("spanC", 12) + " epsilon"),
    (6L, words("lonely", 12))) ++
    (100L to 120L).map(i => (i, banner + s" tail$i"))

  /** From-scratch batch component map: q226-shape screen (distinct
    * (doc, fp), df-cap 2..DfCap, ≥2 shared fps) → CC fixpoint. */
  private def batchComponents(rows: Seq[(Long, String)]): Map[Long, Long] = {
    val fd = StreamingWinnowScreen.fingerprintsNarrow(
        rows.toDF("doc_id", "text"), "doc_id", "text")
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
    Dedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  private def runSlicing(tag: String,
                         slices: Seq[Seq[(Long, String)]]): Unit = {
    val d = Files.createTempDirectory(s"graft-swcc-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    var ingested = Seq.empty[(Long, String)]
    for ((slice, i) <- slices.zipWithIndex) {
      slice.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(in.toString)
      ingested = ingested ++ slice

      // brand-new query per slice against the same checkpoint
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = StreamingWinnowScreen.coPairs(stream, "doc_id", "text")
        .toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val log = spark.read.parquet(out)
        .as[(Long, Long, Long, Boolean)].collect()
      val sat = log.filter(_._4).map(_._1).toSet
      // filter + keySet, NOT collect { case (ab, _) => ab }: collect
      // on a Map whose partial function returns a Tuple2 rebuilds a
      // MAP, silently collapsing the pair set by doc_a (caught by the
      // round-12 parameterized-cap test, where the flood's pairs
      // share left endpoints)
      val confirmed = log
        .filter(r => !r._4 && !sat.contains(r._1))
        .groupBy(r => (r._2, r._3))
        .filter { case (_, rs) => rs.map(_._1).distinct.length >= 2 }
        .keySet.toSeq
      val streamed =
        if (confirmed.isEmpty) Map.empty[Long, Long]
        else Dedup.connectedComponents(
            confirmed.toDF("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val reference = batchComponents(ingested)
      assert(streamed == reference,
        s"$tag slice $i: streamed winnow CC != from-scratch batch CC")
    }
  }

  test("winnow-pair CC equals the batch map after every slice") {
    runSlicing("asc", Seq(
      corpus.filter(_._1 <= 2),            // half of the 1-2-3 chain
      corpus.filter(t => t._1 > 2 && t._1 <= 5),
      corpus.filter(_._1 > 5)))            // loner + banner flood
    // and the final structure is the hand-designed one
    assert(batchComponents(corpus) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("parity holds for out-of-order arrival (banner flood first)") {
    runSlicing("desc", Seq(
      corpus.filter(_._1 >= 100),          // saturation before content
      corpus.filter(t => t._1 >= 3 && t._1 < 100),
      corpus.filter(_._1 < 3)))            // chain closes last
  }
}
