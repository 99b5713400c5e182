package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * All hashing is built on `md5` (codegen'd, and bit-identical across
  * engines, which makes every stage oracle-checkable in DuckDB — unlike
  * `hash()`/`xxhash64`, whose seeds differ per engine):
  *
  *  - exact dedup: hash-groupBy on md5(text) — one shuffle on the hash.
  *  - MinHash: signature component j = MIN(md5(j || shingle)) over the
  *    doc's shingle set. Lexicographic min over the hex strings is a
  *    uniform permutation min, so the standard MinHash Jaccard estimate
  *    applies. One groupBy(doc) computes all k components (k agg columns,
  *    no k-fold row blowup).
  *  - LSH banding: band key = md5(band_idx || sig_slice); candidate pairs
  *    come from a self equi-join on the band key — a shuffle join keyed by
  *    band, which is exactly the partitioning you want at 100 TB (each
  *    band bucket lands on one reducer; no O(n²) anywhere).
  *  - SimHash: 16-bit signature from per-token md5 bits, computed as 16
  *    conditional-sum agg columns in a single groupBy(doc) pass (no
  *    per-bit row explosion).
  */
object Dedup {

  /** Character n-gram shingles of `text` (1 shingle for texts shorter
    * than n). */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** (doc, shingle) rows, distinct. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    docs.select(col(idCol), explode(charShingles(col(textCol), n)).as("sh"))
      .distinct()

  /** Per-doc MinHash signature table: idCol, h0..h{k-1}.
    *
    * Hash economy: one md5 yields 32 hex chars = four independent 32-bit
    * slices, so k components cost ceil(k/4) md5 calls per shingle (not
    * k) — the md5s are materialized as columns before the groupBy so
    * they are computed exactly once per shingle row regardless of CSE.
    * Each h_j = MIN over shingles of an 8-hex-char slice, i.e. a
    * permutation-min over a 32-bit uniform hash — the standard MinHash
    * estimator. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    require(k % 4 == 0, "k must be a multiple of 4 (4 slices per md5)")
    // no distinct(): MIN is duplicate-insensitive, and the distinct
    // would cost a full shuffle of the shingle rows before the agg
    val sh = docs.select(col(idCol),
      explode(charShingles(col(textCol), n)).as("sh"))
    val bases = (0 until k / 4).map(b =>
      md5(concat(lit(s"m$b"), col("sh"))).as(s"m$b"))
    val withBases = sh.select(col(idCol) +: bases: _*)
    val aggs = (0 until k).map(j =>
      min(substring(col(s"m${j / 4}"), (j % 4) * 8 + 1, 8)).as(s"h$j"))
    withBases.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs (idA < idB) from `bands` bands of `k/bands`
    * signature rows each. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val sig = minhashSignatures(docs, idCol, textCol, n, k)
    val bandKeys = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"h${b * rows + r}"))
      md5(concat(lit(b.toString) +: slice: _*))
    }
    val banded = sig.select(col(idCol),
      explode(array(bandKeys: _*)).as("bk"))
    val a = banded.select(col(idCol).as("doc_a"), col("bk"))
    val b = banded.select(col(idCol).as("doc_b"), col("bk").as("bk2"))
    a.join(b, col("bk") === col("bk2") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs within `docs`
    * (quadratic in candidate-set size — pre-filter the input, e.g. to LSH
    * candidates or a bounded sample, before calling at scale). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("da"), col("sh"))
    val b = sh.select(col(idCol).as("db"), col("sh").as("sh2"))
    val inter = a.join(b, col("sh") === col("sh2") && col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col(idCol).as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col(idCol).as("db"), col("sz").as("szb")), "db")
      .select(col("da"), col("db"), col("i"),
        (col("sza") + col("szb") - col("i")).as("un"),
        (col("i") / (col("sza") + col("szb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over an undirected pair list (a,b) — turns
    * near-dup candidate PAIRS into dedup CLUSTERS (component id = min
    * member id, so one canonical keeper per cluster).
    *
    * Pure-DataFrame min-label propagation: each iteration joins labels
    * across edges (both directions) and keeps the per-node min; stops
    * when an iteration changes nothing. Converges in O(component
    * diameter) rounds — near-dup clusters are shallow, so this is a
    * handful of small shuffles. localCheckpoint truncates lineage so
    * plans don't grow exponentially across iterations.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // the iterated tables are tiny (≤ |pairs| rows); at the session's
    // full shuffle fan-out each round pays ~8 stages of near-empty-task
    // scheduling — scope the fan-out down for the loop's actions and
    // restore after (the returned frame re-executes under caller conf)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try connectedComponentsLoop(pairs, aCol, bCol, maxIter)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def connectedComponentsLoop(pairs: DataFrame, aCol: String,
                                      bCol: String, maxIter: Int): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    // labels only ever decrease, so the label sum is a strict-monotone
    // fixpoint detector — one cheap agg per iteration instead of a
    // join-based change scan
    var prevSum = labels.agg(sum(col("label"))).collect().head.getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaEdges = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val propagated = labels.union(viaEdges)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // path halving: follow label -> label-of-label, collapsing chains
      // exponentially (O(log diameter) rounds instead of O(diameter))
      val byId = propagated.select(col("id").as("pid"),
        col("label").as("plabel"))
      val next = propagated
        .join(byId, propagated("label") === byId("pid"), "left")
        .select(col("id"),
          coalesce(col("plabel"), col("label")).as("label"))
        .localCheckpoint()
      val s = next.agg(sum(col("label"))).collect().head.getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      i += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("component"))
  }

  /** 16-bit SimHash per doc from whitespace tokens: single groupBy with 16
    * conditional sums. Token hash = first 4 hex chars of md5 decoded to an
    * int via ascii arithmetic (portable to the SQL oracle). */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val h4 = substring(md5(col("tok")), 1, 4)
    def hexDigit(p: Int): Column = {
      val a = ascii(substring(h4, p, 1))
      a - when(a >= 97, 87).otherwise(48)
    }
    val tok16 = ((hexDigit(1) * 16 + hexDigit(2)) * 16 + hexDigit(3)) * 16 +
      hexDigit(4)
    val bitSums = (0 until 16).map { i =>
      val p = 1L << i
      sum(when(floor(col("tok16") / p) % 2 === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val sums = tok.select(col(idCol), tok16.as("tok16"))
      .groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 16).map { i =>
      when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col(idCol), sim.as("simhash"))
  }
}
