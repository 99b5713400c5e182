package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Dedup, Retention}
import graft.streaming.{StreamingWinnowRetention, StreamingWinnowScreen}

/** The churn-delta monitor certified (r11 verdict item 2): the live
  * per-batch keep-flip delta ([[StreamingWinnowRetention.deltaWriter]])
  * equals the diff of CONSECUTIVE from-scratch batch q238 policies —
  * q249's lost/gained census as a stream — after every micro-batch,
  * for ascending and out-of-order slicings, with a brand-new query
  * per slice against the same checkpoints (restart recovery: the
  * predecessor-snapshot lookup must survive a process death). The two
  * flip directions are both exercised: `lost` when a better copy
  * arrives, and the q249 non-monotone `gained` — a df-cap crossing
  * saturates the family's fingerprints, its pair evidence vanishes,
  * and a previously-dropped doc regains keep. */
class StreamingWinnowChurnDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: String, n: Int): String =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  private val banner = words("legal", 12)
  // family 1–2–3 (doc 2 wins), pair 4–5 (tie → 4), loner 6, banner
  // flood 100-120 (online saturation), PLUS the gained-flip family:
  // 31–32 share the 13-token dup span (32 longer ⇒ wins, 31 drops)
  // until the 16-doc flood 200-215 pushes every dup fingerprint past
  // DfCap = 16 — evidence vanishes, 31 regains keep
  private val dupSpan = words("dup", 13)
  private val corpus: Seq[(Long, String, String)] = Seq(
    (1L, "web", "alpha " + words("spanA", 12)),
    (2L, "web", words("spanA", 12) + " " + words("spanB", 12)),
    (3L, "arxiv", words("spanB", 12) + " gamma"),
    (4L, "web", "delta " + words("spanC", 12)),
    (5L, "arxiv", words("spanC", 12) + " epsil"),
    (6L, "web", words("lonely", 12)),
    (31L, "web", "pre " + dupSpan),
    (32L, "arxiv", dupSpan + " post1 post2")) ++
    (100L to 120L).map(i => (i, "web", banner + s" tail$i")) ++
    (200L to 215L).map(i => (i, "crawl", dupSpan + s" t$i"))

  /** q238's keep policy from scratch over `rows` (the batch screen:
    * distinct (doc, fp), df-cap [2, DfCap], ≥2 shared fps → CC →
    * Retention.withKeep). */
  private def batchKeep(rows: Seq[(Long, String, String)])
      : Map[Long, Boolean] = {
    if (rows.isEmpty) return Map.empty
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
      .select(col("doc_id"), col("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  /** The reference delta: keep flips between two consecutive
    * from-scratch policies, restricted to docs present in both. */
  private def refDelta(prev: Map[Long, Boolean],
                       cur: Map[Long, Boolean]): Map[Long, String] =
    prev.keySet.intersect(cur.keySet)
      .filter(id => prev(id) != cur(id))
      .map(id => id -> (if (prev(id)) "lost" else "gained")).toMap

  private def deltaMap(df: DataFrame): Map[Long, String] =
    df.select(col("doc_id"), col("change"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Runs the doc-attrs + delta streams slice by slice (fresh queries
    * per slice = restart recovery), asserting each live delta equals
    * the consecutive-batch reference diff. Returns the deltas. */
  private def runSlicing(tag: String,
                         slices: Seq[Seq[(Long, String, String)]])
      : Seq[Map[Long, String]] = {
    val d = Files.createTempDirectory(s"graft-swdelta-$tag")
    val in = d.resolve("in"); Files.createDirectories(in)
    val ckptAttrs = d.resolve("ckpt-attrs").toString
    val ckptPairs = d.resolve("ckpt-pairs").toString
    val docStore = d.resolve("docs").toString
    val pairLog = d.resolve("pairs").toString
    val snapStore = d.resolve("snaps").toString

    var prevIngested = Seq.empty[(Long, String, String)]
    val deltas = Seq.newBuilder[Map[Long, String]]
    for ((slice, i) <- slices.zipWithIndex) {
      slice.toDF("doc_id", "source", "text")
        .coalesce(1).write.mode("append").parquet(in.toString)

      def stream = spark.readStream
        .schema("doc_id LONG, source STRING, text STRING")
        .parquet(in.toString)

      val qa = StreamingWinnowRetention
        .docAttrs(stream, "doc_id", "source", "text")
        .writeStream.format("parquet")
        .option("path", docStore)
        .outputMode("append")
        .option("checkpointLocation", ckptAttrs)
        .trigger(Trigger.AvailableNow())
        .start()
      qa.awaitTermination()

      var live: Option[Map[Long, String]] = None
      val qp = StreamingWinnowRetention
        .deltaWriter(stream, "doc_id", "text", pairLog, docStore,
          snapStore) { (delta, _) => live = Some(deltaMap(delta)) }
        .option("checkpointLocation", ckptPairs)
        .trigger(Trigger.AvailableNow())
        .start()
      qp.awaitTermination()

      val ingested = prevIngested ++ slice
      val reference = refDelta(batchKeep(prevIngested),
        batchKeep(ingested))
      assert(live.contains(reference),
        s"$tag slice $i: live keep-flip delta ${live} != consecutive " +
          s"batch diff $reference")
      deltas += reference
      prevIngested = ingested
    }
    deltas.result()
  }

  test("delta stream equals consecutive batch diffs, with both flip " +
      "directions exercised (lost on better copy, gained on df-cap " +
      "saturation)") {
    // a flip requires the doc to be in BOTH consecutive snapshots, so
    // each victim is published one slice before its challenger
    val deltas = runSlicing("asc", Seq(
      corpus.filter(_._1 == 1L),
      corpus.filter(t => t._1 >= 2 && t._1 <= 5),   // 1 loses to 2
      corpus.filter(_._1 == 31L),                   // 31 kept alone
      corpus.filter(_._1 == 32L),                   // 31 loses to 32
      corpus.filter(_._1 >= 200),                   // dup flood: 31 gains
      corpus.filter(t => t._1 == 6L || (t._1 >= 100 && t._1 < 200))))
    assert(deltas(1).get(1L).contains("lost"),
      "doc 1 must flip to lost when the better copy arrives")
    assert(deltas(3).get(31L).contains("lost"),
      "doc 31 must lose to the longer 32")
    assert(deltas(4).get(31L).contains("gained"),
      "doc 31 must REGAIN keep when the flood saturates its family's " +
        "fingerprints — the q249 non-monotone direction")
    assert(!deltas(5).contains(6L) && !deltas(5).contains(31L),
      "the banner slice must not flip unrelated docs")
  }

  test("parity holds for out-of-order arrival (floods first)") {
    val deltas = runSlicing("ooo", Seq(
      corpus.filter(_._1 >= 200),                   // dup flood first
      corpus.filter(t => t._1 == 31L || t._1 == 32L), // saturate dup fps
      corpus.filter(_._1 == 3L),                    // 3 kept alone
      corpus.filter(t => t._1 >= 2 && t._1 <= 6 && t._1 != 3L),
      corpus.filter(t => t._1 == 1L || (t._1 >= 100 && t._1 < 200))))
    // slice 1: 31/32's arrival pushes the dup bucket past the cap —
    // the 16-doc flood component dissolves and its 15 losers regain
    // keep (the saturation-driven gained storm, equality-checked)
    assert(deltas(1).count(_._2 == "gained") == 15,
      "the flood's 15 dropped docs must regain keep on saturation")
    // 31/32 arrive AFTER their fingerprints saturated: no pair
    // evidence ever forms, so neither doc may flip in any later slice
    assert(deltas.forall(d => !d.contains(32L)),
      "doc 32 must never flip when the family was pre-saturated")
    assert(deltas(3).get(3L).contains("lost"),
      "doc 3 must flip to lost when the better copy 2 arrives late")
  }
}
