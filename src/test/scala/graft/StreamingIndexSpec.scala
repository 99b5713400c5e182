package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.operators.TrainPrep
import graft.streaming.StreamingIndex

class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(in: java.nio.file.Path, name: String,
                         rows: Seq[(Long, String)]): Unit =
    Files.write(in.resolve(name),
      (rows.map { case (id, t) => s"$id;$t" }.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))

  private def drain(in: java.nio.file.Path, d: java.nio.file.Path): Unit = {
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("sep", ";").csv(in.toString)
    val q = StreamingIndex.run(docs, d.resolve("idx").toString,
      d.resolve("ckpt").toString, _.trigger(Trigger.AvailableNow()))
    q.awaitTermination()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSet

  test("merged streaming index equals the batch operator on the union") {
    val d = Files.createTempDirectory("graft-sidx")
    val in = d.resolve("in"); Files.createDirectories(in)
    val b1 = Seq(1L -> "a b a", 2L -> "b c")
    val b2 = Seq(3L -> "a", 4L -> "c c d")
    writeBatch(in, "b1.csv", b1)
    drain(in, d)
    writeBatch(in, "b2.csv", b2)
    drain(in, d)
    val streamed = rows(StreamingIndex.index(spark,
      d.resolve("idx").toString))
    val batch = rows(TrainPrep.postings((b1 ++ b2).toDF("doc_id", "text")))
    assert(streamed == batch)
  }

  test("BM25 over the incremental index matches BM25 over the batch corpus") {
    val d = Files.createTempDirectory("graft-sidx-bm25")
    val in = d.resolve("in"); Files.createDirectories(in)
    val b1 = Seq(1L -> "a b a", 2L -> "a c")
    val b2 = Seq(3L -> "b b b c", 4L -> "c c")
    writeBatch(in, "b1.csv", b1)
    drain(in, d)
    writeBatch(in, "b2.csv", b2)
    drain(in, d)
    // the search engine runs off the stored index alone: doc lengths
    // and corpus stats derive from the merged postings
    val fromIndex = TrainPrep.bm25RankFromPostings(
        StreamingIndex.mergedTermDocs(spark, d.resolve("idx").toString),
        Seq("a", "b"), topK = 10)
      .collect().map(_.toSeq).toSeq
    val fromDocs = TrainPrep.bm25Rank(
        (b1 ++ b2).toDF("doc_id", "text"), Seq("a", "b"), topK = 10)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex == fromDocs && fromIndex.nonEmpty)
  }

  test("hybrid RRF fusion served off the incremental index matches batch fusion") {
    val d = Files.createTempDirectory("graft-sidx-rrf")
    val in = d.resolve("in"); Files.createDirectories(in)
    val b1 = Seq(1L -> "a b a", 2L -> "a c")
    val b2 = Seq(3L -> "b b b c", 4L -> "c c")
    writeBatch(in, "b1.csv", b1)
    drain(in, d)
    writeBatch(in, "b2.csv", b2)
    drain(in, d)
    // the lexical list comes from the STORED index artifact; the
    // semantic list is any bounded (doc_id, rank) frame — fusion only
    // sees ranks, so serving lexical retrieval off the incremental
    // index must leave the hybrid result bit-identical
    val sem = Seq(4L -> 1L, 1L -> 2L, 9L -> 3L).toDF("doc_id", "rank")
    val fromIndex = graft.operators.Fusion.rrf(Seq(
        graft.operators.Fusion.rankOf(TrainPrep.bm25RankFromPostings(
          StreamingIndex.mergedTermDocs(spark, d.resolve("idx").toString),
          Seq("a", "b"), topK = 10), "score_fp"), sem), 60, 5)
      .collect().map(_.toSeq).toSeq
    val fromDocs = graft.operators.Fusion.rrf(Seq(
        graft.operators.Fusion.rankOf(TrainPrep.bm25Rank(
          (b1 ++ b2).toDF("doc_id", "text"), Seq("a", "b"), topK = 10),
          "score_fp"), sem), 60, 5)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex == fromDocs && fromIndex.nonEmpty)
  }

  test("index is empty (not an error) before any batch commits") {
    val d = Files.createTempDirectory("graft-sidx0")
    assert(StreamingIndex.index(spark,
      d.resolve("never-written").toString).count() == 0L)
  }

  test("restart with the same checkpoint does not duplicate postings") {
    val d = Files.createTempDirectory("graft-sidx2")
    val in = d.resolve("in"); Files.createDirectories(in)
    writeBatch(in, "b1.csv", Seq(1L -> "x y", 2L -> "y"))
    drain(in, d)
    // restart on an unchanged source: no new batch, index unchanged
    drain(in, d)
    val got = rows(StreamingIndex.index(spark, d.resolve("idx").toString))
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Set(("x", 1L, 1L), ("y", 2L, 2L)))
  }

  test("a re-crawled document's tf deltas merge additively") {
    val d = Files.createTempDirectory("graft-sidx3")
    val in = d.resolve("in"); Files.createDirectories(in)
    writeBatch(in, "b1.csv", Seq(1L -> "w w"))
    drain(in, d)
    writeBatch(in, "b2.csv", Seq(1L -> "w"))
    drain(in, d)
    val got = rows(StreamingIndex.index(spark, d.resolve("idx").toString))
    // df counts the doc once; tf sums both crawls
    assert(got.map(t => (t._1, t._2, t._3)) == Set(("w", 1L, 3L)))
  }
}
