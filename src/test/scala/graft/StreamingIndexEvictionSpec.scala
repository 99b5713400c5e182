package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextAnalysis
import graft.streaming.StreamingIndexEviction

/** Stream == batch for the gram-index TTL aging (q233's kernel): the
  * per-gram max over the streamed last_seen change log equals the
  * from-scratch batch index — full map AND aged filter — after every
  * slice, for epoch-ascending, out-of-order, and one-shot arrival,
  * with a brand-new query object per slice against the same
  * checkpoint (state RECOVERY, not just continuity). */
class StreamingIndexEvictionSpec extends SparkSpec {
  import spark.implicits._

  private val Cutoff = 2

  /** q233's history side on a small id range: epoch is the
    * block-cycled (doc_id div 20) % 5. */
  private def docsAll: DataFrame = Tables.documents(spark, sf())
    .filter(col("doc_id") < 120 && col("doc_id") % 7 =!= 0)
    .select(col("doc_id"), col("text"))

  /** From-scratch batch index of `docs`: distinct gram → max epoch. */
  private def batchIndex(docs: DataFrame): Map[String, Int] =
    docs
      .select(expr("(doc_id div 20) % 5").cast("int").as("epoch"),
        explode(TextAnalysis.wordNgrams(col("text"), 8)).as("g"))
      .select(md5(col("g")).as("gh"), col("epoch"))
      .groupBy(col("gh")).agg(max(col("epoch")).as("last_seen"))
      .as[(String, Int)].collect().toMap

  private def runSlicing(tag: String,
                         slices: Seq[DataFrame => DataFrame]): Unit = {
    val d = Files.createTempDirectory(s"graft-sie-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    var ingested: Option[DataFrame] = None
    for ((slice, i) <- slices.zipWithIndex) {
      val part = slice(docsAll)
      part.coalesce(1).write.mode("append").parquet(in.toString)
      ingested = Some(ingested.fold(part)(_.union(part)))

      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(in.toString)
      val q = StreamingIndexEviction.lastSeenUpdates(stream, "text",
          expr("(doc_id div 20) % 5"))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val streamed = spark.read.parquet(out)
        .groupBy(col("gh")).agg(max(col("last_seen")).as("last_seen"))
        .as[(String, Int)].collect().toMap
      val reference = batchIndex(ingested.get)
      assert(streamed == reference,
        s"$tag slice $i: streamed last_seen map != from-scratch index")
      val agedS = streamed.filter(_._2 >= Cutoff).keySet
      val agedR = reference.filter(_._2 >= Cutoff).keySet
      assert(agedS == agedR,
        s"$tag slice $i: aged index != from-scratch aged rebuild")
    }
    val fin = batchIndex(ingested.get)
    assert(fin.exists(_._2 >= Cutoff) && fin.exists(_._2 < Cutoff),
      s"$tag: corpus must exercise both retained and evicted grams")
  }

  test("aged index equals the from-scratch rebuild after every slice") {
    runSlicing("asc", Seq(
      _.filter(expr("(doc_id div 20) % 5") < 2),
      _.filter(expr("(doc_id div 20) % 5").between(2, 3)),
      _.filter(expr("(doc_id div 20) % 5") === 4)))
  }

  test("parity holds for out-of-order epoch arrival") {
    // newest epochs first: the running max must absorb stale arrivals
    // silently (no change rows), leaving the same final index
    runSlicing("desc", Seq(
      _.filter(expr("(doc_id div 20) % 5") === 4),
      _.filter(expr("(doc_id div 20) % 5").between(2, 3)),
      _.filter(expr("(doc_id div 20) % 5") < 2)))
  }

  test("one-shot arrival matches too") {
    runSlicing("one", Seq(identity[DataFrame] _))
  }
}
