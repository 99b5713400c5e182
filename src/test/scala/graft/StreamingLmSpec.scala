package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.NgramLm

/** The LM scorer's shuffle-free broadcast path and its streaming twin:
  * scoreWithModel must be bit-identical to the join-based batch scorer
  * at minCount=1, on a stream (multi-batch) as in batch; the frequency
  * cut reroutes cut bigrams through the backoff branch. */
class StreamingLmSpec extends SparkSpec {
  import spark.implicits._

  test("broadcast-model scorer is bit-identical to the join scorer") {
    val docs = Tables.documents(spark, sf()).limit(200)
    val model = NgramLm.broadcastModel(docs)
    val a = NgramLm.score(docs, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = NgramLm.scoreWithModel(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("streaming scoring agrees with batch across micro-batches") {
    val d = Files.createTempDirectory("graft-slm")
    val in = d.resolve("in"); Files.createDirectories(in)
    val out = d.resolve("out").toString

    val rows = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "z z a"),
      (4L, "solo"), (5L, "b c a b"))
    // two files => maxFilesPerTrigger=1 forces two micro-batches
    rows.grouped(3).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(s"docs$i.csv"),
        g.map { case (id, t) => s"$id;$t" }.mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
    }
    val schema = "doc_id LONG, text STRING"
    val batch = spark.read.schema(schema)
      .option("delimiter", ";").csv(in.toString)
    val model = NgramLm.broadcastModel(batch)

    val stream = spark.readStream.schema(schema)
      .option("delimiter", ";").option("maxFilesPerTrigger", "1")
      .csv(in.toString)
    val q = NgramLm.scoreWithModel(stream, model)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", d.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = NgramLm.score(batch, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.map(_._1) == Set(1L, 2L, 3L, 5L), "1-token doc dropped")
  }

  test("frequency cut reroutes cut bigrams through backoff") {
    // model: "a b a b" + "a b x" => bg (a,b):3 (b,a):1 (b,x):1; ug a:3 b:3 x:1
    val model2 = NgramLm.broadcastModel(
      Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text"),
      minCount = 2L)
    assert(model2.bg.keySet == Set(("a", "b")), "minCount=2 keeps only (a,b)")
    assert(model2.ug.keySet == Set("a", "b"), "x cut from unigrams")
    val got = NgramLm.scoreWithModel(
      Seq((9L, "b a b")).toDF("doc_id", "text"), model2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // (b,a): cut bigram -> backoff 400000*ug(a)=3 div total=7 = 171428
    // (a,b): kept -> 1000000*3 div 3 = 1000000; mean = 585714
    assert(got == ((2L, 585714L)))
  }
}
