package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingWinnowScreen

/** Stream == batch for the winnowed-fingerprint dedup screen: the
  * ≥2-shared-fp confirm over the streamed co-occurrences (minus
  * saturated buckets) equals the batch q226-style screen, for any
  * slicing of the input; the online df-cap actually saturates on a
  * boilerplate fingerprint; the narrow per-row fingerprint path
  * equals the batch window-min derivation. */
class StreamingWinnowScreenSpec extends SparkSpec {
  import spark.implicits._

  // 9-word docs with a controlled shared span: pairs (1,2) and (3,4)
  // each share a full 7+-token span; doc 5 is unrelated; docs 100+
  // all open with the same 8-token boilerplate banner, saturating its
  // fingerprints past the cap
  private def words(seed: String, n: Int): String =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  private val banner = words("legal", 9)
  private val corpus: Seq[(Long, String)] =
    Seq(
      (1L, "alpha " + words("shareA", 8)),
      (2L, "beta "  + words("shareA", 8)),
      (3L, words("shareB", 8) + " gamma"),
      (4L, words("shareB", 8) + " delta"),
      (5L, words("lonely", 9))) ++
      (100L to 120L).map(i => (i, banner + s" tail$i"))

  private def batchScreen(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val fd = StreamingWinnowScreen.fingerprintsNarrow(
      rows.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("docId"), col("fp")).distinct()
    val usable = fd.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, StreamingWinnowScreen.DfCap))
      .select(col("fp"))
    val capped = fd.join(usable, "fp")
    capped.select(col("fp"), col("docId").as("a"))
      .join(capped.select(col("fp"), col("docId").as("b")), Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
  }

  private def streamScreen(slices: Seq[Seq[(Long, String)]],
                           name: String): (Set[(Long, Long)], Int) = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingWinnowScreen.coPairs(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      slices.foreach { sl => ms.addData(sl: _*); q.processAllAvailable() }
      val rows = spark.sql(s"SELECT * FROM $name")
        .as[(Long, Long, Long, Boolean)].collect()
      val sat = rows.filter(_._4).map(_._1).toSet
      // NOTE: .filter + .keySet, NOT .collect { case (ab, _) => ab } —
      // collect on a Map whose partial function returns a Tuple2
      // rebuilds a MAP, silently collapsing pairs by doc_a
      val pairs = rows.filter(r => !r._4 && !sat.contains(r._1))
        .groupBy(r => (r._2, r._3))
        .filter { case (_, rs) => rs.map(_._1).distinct.length >= 2 }
        .keySet.toSet
      (pairs, sat.size)
    } finally q.stop()
  }

  test("streamed screen equals the batch screen for two slicings") {
    val expected = batchScreen(corpus)
    assert(expected == Set((1L, 2L), (3L, 4L)))
    val (oneShot, sat1) = streamScreen(Seq(corpus), "wsc_one")
    assert(oneShot == expected)
    assert(sat1 > 0, "the banner fingerprints must saturate the cap")
    val (a, b) = corpus.partition(_._1 % 2 == 0)
    val (sliced, _) = streamScreen(Seq(a, b), "wsc_two")
    assert(sliced == expected)
  }

  test("narrow fingerprint path equals the batch window-min derivation") {
    val docs = corpus.toDF("doc_id", "text")
    val narrow = StreamingWinnowScreen.fingerprintsNarrow(
      docs, "doc_id", "text")
      .select(col("docId"), col("fp")).distinct()
      .as[(Long, Long)].collect().toSet
    // batch derivation: explode grams with position, window ids,
    // min per (doc, window), distinct — the SharedWinnow shape
    val grams = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.wordNgrams(col("text"), 4).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("ng"),
        posexplode(col("gs")))
      .filter(col("ng") >= 4)
      .select(col("doc_id"), col("ng"), col("pos").cast("long").as("p"),
        graft.operators.KmvSketch.hash32(col("col")).as("h"))
    val batch = grams.select(col("doc_id"), col("h"),
        explode(sequence(greatest(col("p") - 3, lit(0L)),
          least(col("p"), col("ng") - 4))).as("j"))
      .groupBy(col("doc_id"), col("j")).agg(min(col("h")).as("fp"))
      .select(col("doc_id"), col("fp")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(narrow == batch)
  }

  test("a saturated bucket emits exactly one tombstone and goes silent") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingWinnowScreen.coPairs(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("wsc_sat")
      .outputMode("append").start()
    try {
      // 30 copies of the same banner doc body across two batches
      ms.addData((200L to 215L).map(i => (i, banner + s" x$i")): _*)
      q.processAllAvailable()
      ms.addData((216L to 229L).map(i => (i, banner + s" x$i")): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM wsc_sat")
        .as[(Long, Long, Long, Boolean)].collect()
      val byFp = rows.groupBy(_._1)
      for ((fp, rs) <- byFp if rs.exists(_._4)) {
        assert(rs.count(_._4) == 1, s"fp $fp: one tombstone only")
        // nothing emitted for that fp AFTER saturation is guaranteed
        // by the state machine; the memory sink holds its pre-sat
        // pairs, which downstream drops via the tombstone
      }
      assert(rows.exists(_._4), "the banner must saturate at 30 docs")
    } finally q.stop()
  }

  test("parameterized df-cap: a raised cap keeps the flood as pairs " +
      "online, equal to the batch screen at the same cap") {
    // the duplication-aware deployment (SharedWinnow.adaptiveCap →
    // coPairs dfCap): at cap 32 the 21-doc banner flood is below the
    // threshold, so its shared fingerprints are EVIDENCE, not
    // boilerplate — stream == batch at the raised cap, and the flood
    // pairs appear where the default cap tombstoned them
    val cap = 32
    val fd = StreamingWinnowScreen.fingerprintsNarrow(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("docId"), col("fp")).distinct()
    val usable = fd.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, cap)).select(col("fp"))
    val capped = fd.join(usable, "fp")
    val batchAtCap = capped.select(col("fp"), col("docId").as("a"))
      .join(capped.select(col("fp"), col("docId").as("b")), Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    assert(batchAtCap.contains((100L, 101L)),
      "the flood must pair under the raised batch cap")

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = StreamingWinnowScreen.coPairs(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", dfCap = cap)
    val q = out.writeStream.format("memory").queryName("wsc_cap")
      .outputMode("append").start()
    try {
      val (a, b) = corpus.partition(_._1 < 110)
      ms.addData(a: _*); q.processAllAvailable()
      ms.addData(b: _*); q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM wsc_cap")
        .as[(Long, Long, Long, Boolean)].collect()
      val sat = rows.filter(_._4).map(_._1).toSet
      // filter + keySet (the collect-on-Map trap: a Tuple2-returning
      // partial function rebuilds a Map and collapses by doc_a)
      val pairs = rows.filter(r => !r._4 && !sat.contains(r._1))
        .groupBy(r => (r._2, r._3))
        .filter { case (_, rs) => rs.map(_._1).distinct.length >= 2 }
        .keySet.toSet
      assert(pairs == batchAtCap,
        "streamed screen at dfCap=32 must equal the batch screen at 32")
    } finally q.stop()
  }
}
