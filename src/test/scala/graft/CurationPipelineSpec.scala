package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline
import graft.sources.CorpusSink

/** The end-to-end curate-and-write composition. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ~100 tokens, 1/3 stopwords, no repeated bigram: clears the length
  // band, the stopword floor, the repetition cap and the 0.5 score
  private val good =
    (1 to 34).map(i => s"the alpha$i beta$i").mkString(" ")

  test("curate: normalizes, quality-filters, dedups with min-id keeper") {
    val docs = Seq(
      (1L, good, "en"),
      (2L, good, "en"),                       // exact dup of 1 -> dropped
      (3L, good + " cafe\u0301", "en"),      // decomposed variant
      (4L, good + " caf\u00e9", "en"),       // NFC variant of 3 -> dup after normalize
      (5L, "short", "en"),                    // fails length band
      (6L, ("spam " * 40).trim, "en"))        // fails stopword/repetition
      .toDF("doc_id", "text", "lang")
    val out = CurationPipeline.curate(docs, "doc_id", "text")
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    // 1 keeps (min id of {1,2}); 3 keeps (min of {3,4} post-normalize)
    assert(kept == Seq(1L, 3L))
    // the surviving variant is stored NFC-normalized
    val t3 = out.filter(col("doc_id") === 3L)
      .select("text").as[String].head()
    assert(t3.endsWith("caf\u00e9"))
  }

  test("curate is a fixpoint: curate(curate(x)) == curate(x) on random corpora") {
    val rnd = new scala.util.Random(17)
    val words = Vector("the", "a", "of", "and", "to", "in", "is") ++
      (1 to 60).map(i => s"w$i")
    val docs = (1 to 300).map { i =>
      val n = 5 + rnd.nextInt(150)
      val body = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
      // sprinkle decomposed accents + exact dups to exercise both stages
      val t = if (i % 11 == 0) body + " cafe\u0301" else body
      (i.toLong, if (i % 13 == 0) "dup seed " + (i % 3) else t, "en")
    }.toDF("doc_id", "text", "lang")
    val once = CurationPipeline.curate(docs, "doc_id", "text")
    val twice = CurationPipeline.curate(once, "doc_id", "text")
    val a = once.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = twice.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("run: writes hive partitions + manifest; re-run is idempotent") {
    val dir = Files.createTempDirectory("graft-corpus").toString + "/corpus"
    val docs = Seq(
      (1L, good, "en"), (2L, good + " extra tail words", "de"),
      (3L, good, "en")) // dup of 1
      .toDF("doc_id", "text", "lang")
    val m1 = CurationPipeline.run(docs, "doc_id", "text", dir, Seq("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(m1 == Set(("de", 1L), ("en", 1L)))
    // partition directories exist; reading back prunes by lang
    val back = spark.read.parquet(dir)
    assert(back.filter(col("lang") === "en").count() == 1)
    assert(back.filter(col("lang") === "de").count() == 1)
    // manifest on disk matches the returned frame
    val mDisk = spark.read.parquet(s"$dir/_manifest")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mDisk == m1)
    // idempotent re-run: same inputs, same outputs, no duplication
    val m2 = CurationPipeline.run(docs, "doc_id", "text", dir, Seq("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(m2 == m1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("CorpusSink.write: maxRecordsPerFile splits hot partitions") {
    val dir = Files.createTempDirectory("graft-split").toString + "/c"
    val docs = spark.range(100)
      .select(col("id").as("doc_id"), lit("en").as("lang"),
        concat(lit("body "), col("id").cast("string")).as("text"))
    CorpusSink.write(docs, dir, Seq("lang"), maxRecordsPerFile = 10L)
    val files = new java.io.File(s"$dir/lang=en").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files >= 10, s"expected >=10 files, got $files")
    assert(spark.read.parquet(dir).count() == 100)
  }
}
