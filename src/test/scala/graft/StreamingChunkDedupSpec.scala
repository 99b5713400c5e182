package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingChunkDedup

/** Chunk-level streaming dedup: state survives micro-batches and the
  * verdict set matches the batch keep-first window on the same corpus
  * (order-respecting arrival, the shared incremental convention). */
class StreamingChunkDedupSpec extends SparkSpec {

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "a b c d e f",   // chunks (n=3): "a b c", "d e f"
    2L -> "a b c x y z",   // chunk 0 duplicates doc1's chunk 0
    3L -> "d e f a b c",   // both chunks duplicate doc1's, swapped
    4L -> "q r s")         // unique

  test("cross-batch chunk verdicts equal the batch keep-first window") {
    val d = Files.createTempDirectory("graft-schunk")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckpt = d.resolve("ckpt").toString
    val out = d.resolve("out").toString

    def runBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      Files.write(in.resolve(name),
        rows.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("delimiter", ";")
        .csv(in.toString)
      val q = StreamingChunkDedup.verdicts(stream, "doc_id", "text", 3)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // arrival respects id order: ids 1-2, then 3-4
    runBatch("b1.csv", docs.filter(_._1 <= 2))
    runBatch("b2.csv", docs.filter(_._1 > 2))

    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("keeper"), r.getAs[Boolean]("is_duplicate")))
      .toSet

    // batch twin: keep-first window over the SAME chunk rows
    import spark.implicits._
    val w = Window.partitionBy(col("ch"))
    val expected = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(graft.operators.TextAnalysis.wordChunks(col("text"), 3)))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        (col("doc_id") * 100000L + col("pos")).as("packed"),
        md5(col("col")).as("ch"))
      .withColumn("keeper", min(col("packed")).over(w))
      .select(col("doc_id"), col("chunk_idx"), col("keeper"),
        (col("packed") =!= col("keeper")).as("is_duplicate"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("keeper"), r.getAs[Boolean]("is_duplicate")))
      .toSet

    assert(got == expected)
    // sanity: doc3 lost BOTH chunks to doc1, doc4 kept its only chunk
    assert(got.filter(_._1 == 3L).forall(_._4))
    assert(got.filter(_._1 == 4L).forall(!_._4))
  }
}
