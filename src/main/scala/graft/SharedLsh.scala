package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** Wall-clock ledger for session-artifact builds (the r12 verdict's
  * accounting ask): every Shared* cache getter wraps its build
  * expression in [[timed]], so whatever the warmup pass materializes
  * lands here with its build seconds and the bench can CHARGE the
  * artifacts instead of hiding them inside the warmup. Entries
  * accumulate (parameterised getters like strongComponentsAt build
  * once per parameter) and are INCLUSIVE of nested first-time builds
  * they trigger (candidatePairs' first build includes bandKeys' —
  * read the map as "seconds attributable to first demand", not a
  * disjoint partition). Timing-only: the build expression is passed
  * through unchanged, so cached results and semantics are untouched. */
object ArtifactTimer {
  private val times = TrieMap.empty[String, Double]
  def timed[T](name: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val r = build
    val dt = (System.nanoTime() - t0) / 1e9
    times.updateWith(name)(prev => Some(prev.getOrElse(0.0) + dt))
    r
  }
  def snapshot: Map[String, Double] = times.toMap
  def clear(): Unit = times.clear()
}

/** Session-scoped cache for the LSH dedup pipeline's expensive shared
  * stages, keyed by (session, data dir, parameters).
  *
  * q17 (candidate pairs), q40 (clusters) and q44 (retention stats) are
  * all views over the same two artifacts:
  *
  *   band table  = shingle → minhash signature → band keys   (1 pass)
  *   components  = star edges → connected components         (CC loop)
  *
  * Recomputing those per query tripled the most expensive work in the
  * suite. This cache materializes each artifact once per session+input
  * (`localCheckpoint`) and shares it — exactly the move a 100 TB
  * pipeline makes by persisting the band table and the component map to
  * parquet between stages; in-process the checkpoint is the same
  * dataflow cut. Correctness is unaffected: both artifacts are
  * deterministic functions of the input (md5-based hashing, exact CC
  * fixpoint), so a cached read equals a recompute bit-for-bit.
  *
  * Lifecycle: checkpointed blocks live until [[clear]] or session end.
  * Entries are keyed by the session object, so a stopped session's
  * entries are dead weight only until the next [[clear]] — test suites
  * should clear in afterAll.
  */
object SharedLsh {

  final case class Params(n: Int, k: Int, bands: Int)
  val Default: Params = Params(n = 5, k = 8, bands = 2)

  private final case class Key(session: SparkSession, dir: String, p: Params)
  private val bandCache = TrieMap.empty[Key, DataFrame]
  private val compCache = TrieMap.empty[Key, DataFrame]
  private val sigCache = TrieMap.empty[Key, DataFrame]
  private val pairCache = TrieMap.empty[Key, DataFrame]
  private val candShCache = TrieMap.empty[Key, DataFrame]
  private val incCache = TrieMap.empty[Key, DataFrame]

  /** Materialized (doc_id, bk) band table for the documents table —
    * via the NARROW signature path (per-row array min, zero shuffles;
    * identical rows to the groupBy path, spec-asserted in
    * StreamingNearDupSpec). */
  def bandKeys(s: SparkSession, dir: String,
               p: Params = Default): DataFrame =
    bandCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.bandKeys")(
      Dedup.lshBandKeysNarrow(Tables.documents(s, dir), "doc_id", "text",
        p.n, p.k, p.bands).localCheckpoint()))

  /** Materialized (doc_id, h0..h{k-1}) minhash signature table — the
    * wide row shape consumers that compare signatures component-wise
    * (q172's estimator calibration) need, cached next to [[bandKeys]]
    * so the md5-per-shingle pass is paid once per session+input. */
  def signatures(s: SparkSession, dir: String,
                 p: Params = Default): DataFrame =
    sigCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.signatures")(
      Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
        p.n, p.k).localCheckpoint()))

  /** Materialized candidate pairs (doc_a < doc_b) from the shared band
    * table. Cached like the band table itself: the bk self-join +
    * distinct is re-derived by every candidate-bounded consumer
    * (q17/q82/q172/…), and the result is the small screened pair set —
    * exactly the artifact a pipeline persists between the banding and
    * verification stages. */
  def candidatePairs(s: SparkSession, dir: String,
                     p: Params = Default): DataFrame =
    pairCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.candidatePairs")(
      Dedup.lshCandidatePairsFrom(bandKeys(s, dir, p), "doc_id")
        .localCheckpoint()))

  /** Materialized distinct (doc_id, sh) n-shingle rows for CANDIDATE
    * docs only — the verification-stage artifact every exact-overlap
    * kernel over the LSH-screened set reads (q172's exact Jaccard):
    * restrict to the candidate-doc set FIRST, then explode. Bounded by
    * candidate volume × doc length, never corpus × doc length. */
  def candidateShingleRows(s: SparkSession, dir: String,
                           p: Params = Default): DataFrame =
    candShCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.candidateShingleRows")( {
      import org.apache.spark.sql.functions._
      val cand = candidatePairs(s, dir, p)
      val cdocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b"))).distinct()
      Tables.documents(s, dir).join(broadcast(cdocs), "doc_id")
        .select(col("doc_id"),
          explode(Dedup.charShingles(col("text"), p.n)).as("sh"))
        .distinct()
        .localCheckpoint()
    }))

  /** Materialized (doc_id, component) near-dup cluster map: star edges
    * over the shared band table → connected components. */
  def components(s: SparkSession, dir: String,
                 p: Params = Default): DataFrame =
    compCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.components")(
      Dedup.connectedComponents(
        Dedup.lshStarEdgesFrom(bandKeys(s, dir, p), "doc_id"))
        .localCheckpoint()))

  /** Materialized INCREMENTALLY-maintained component map (q212): the
    * history docs' (doc_id % 10 ≠ 0) map is the stored artifact, a
    * delta batch contributes only [[Dedup.incrementalCandidatePairs]],
    * and CC runs over stored-map star edges ∪ delta pairs — the merge
    * graph is |history map| + |delta pairs| edges, independent of
    * history PAIR volume. Cached like [[components]]: both CC loops
    * are deterministic exact fixpoints, and the merged map is
    * precisely the artifact an incremental pipeline persists between
    * batches. */
  def incrementalComponents(s: SparkSession, dir: String,
                            p: Params = Default): DataFrame =
    incCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.incrementalComponents")( {
      import org.apache.spark.sql.functions.col
      val banded = bandKeys(s, dir, p)
      val hist = banded.filter(col("doc_id") % 10 =!= 0)
      val delta = banded.filter(col("doc_id") % 10 === 0)
      val stored = Dedup.connectedComponents(
        Dedup.lshStarEdgesFrom(hist, "doc_id"))
      val storedEdges = stored
        .filter(col("doc_id") =!= col("component"))
        .select(col("component").as("doc_a"), col("doc_id").as("doc_b"))
      val deltaPairs = Dedup.incrementalCandidatePairs(
        hist, delta, "doc_id")
      Dedup.connectedComponents(storedEdges.union(deltaPairs).distinct())
        .localCheckpoint()
    }))

  private val megaEdgeCache = TrieMap.empty[Key, DataFrame]
  private val strongCompCache = TrieMap.empty[(Key, Long), DataFrame]

  /** Exact 5-gram edge Jaccard for every candidate edge INSIDE the
    * 11+-member megaclusters: (component, csize, doc_a, doc_b, jfp)
    * with zero-overlap chance collisions kept (jfp = 0 via the left
    * join). The q243 diagnosis and the q244 repair consume the same
    * frame — shingles are computed only for megacluster members, all
    * joins shuffle-hash (edge volume scales with duplication rate). */
  def megaEdgeJaccard(s: SparkSession, dir: String,
                      p: Params = Default): DataFrame =
    megaEdgeCache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedLsh.megaEdgeJaccard")( {
      import org.apache.spark.sql.functions._
      val comps = components(s, dir, p)
      val big = comps.groupBy(col("component"))
        .agg(count(lit(1)).as("csize"))
        .filter(col("csize") >= 11)
      val members = comps.join(big.hint("shuffle_hash"), "component")
        .localCheckpoint()
      val edges = candidatePairs(s, dir, p)
        .join(members.select(col("doc_id").as("doc_a"),
          col("component"), col("csize")).hint("shuffle_hash"), "doc_a")
      val sh = Dedup.shingleRows(
        Tables.documents(s, dir).join(
          members.select(col("doc_id")).hint("shuffle_hash"), "doc_id"),
        "doc_id", "text", 5)
        .localCheckpoint()
      val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = edges
        .join(sh.select(col("doc_id").as("doc_a"), col("sh"))
          .hint("shuffle_hash"), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh"))
          .hint("shuffle_hash"), Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
      edges
        .join(inter.hint("shuffle_hash"), Seq("doc_a", "doc_b"), "left")
        .join(szs.select(col("doc_id").as("doc_a"), col("sz").as("sza"))
          .hint("shuffle_hash"), "doc_a")
        .join(szs.select(col("doc_id").as("doc_b"), col("sz").as("szb"))
          .hint("shuffle_hash"), "doc_b")
        .select(col("component"), col("csize"), col("doc_a"), col("doc_b"),
          expr("""CAST(CAST(coalesce(i, 0L) AS DECIMAL(38,0)) * 1000000
            div (sza + szb - coalesce(i, 0L)) AS BIGINT)""").as("jfp"))
        .localCheckpoint()
    }))

  /** Exact connected components of the STRONG-edge subgraph (edge
    * Jaccard ≥ 0.2) inside the megaclusters — the q244 repair map,
    * cached like [[components]]. */
  def strongComponents(s: SparkSession, dir: String,
                       p: Params = Default): DataFrame =
    strongComponentsAt(s, dir, 200000L, p)

  /** [[strongComponents]] at an arbitrary edge-Jaccard threshold —
    * cached per (session, dir, threshold) so q248's sweep pays each
    * fixpoint once per session (a CC fixpoint re-run per bench pass
    * costs the full per-round scheduling floor, SCALE.md lesson #7 —
    * measured 16 s/pass for the three uncached sweeps). */
  def strongComponentsAt(s: SparkSession, dir: String, thrPpm: Long,
                         p: Params = Default): DataFrame = {
    import org.apache.spark.sql.functions.col
    strongCompCache.getOrElseUpdate((Key(s, dir, p), thrPpm),
      ArtifactTimer.timed("SharedLsh.strongComponentsAt")(
      Dedup.connectedComponents(
        megaEdgeJaccard(s, dir, p).filter(col("jfp") >= thrPpm)
          .select(col("doc_a"), col("doc_b")))
        .localCheckpoint()))
  }

  /** Unpersist every cached artifact and empty the cache. */
  def clear(): Unit = synchronized {
    (bandCache.values ++ compCache.values ++ sigCache.values ++
      pairCache.values ++ candShCache.values ++ incCache.values ++
      megaEdgeCache.values ++ strongCompCache.values)
      .foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    bandCache.clear()
    compCache.clear()
    sigCache.clear()
    pairCache.clear()
    candShCache.clear()
    incCache.clear()
    megaEdgeCache.clear()
    strongCompCache.clear()
  }
}

/** Same artifact-sharing move for the substring-dedup pair: q75
  * (repeated-span coverage) and q86 (exact dup spans) both start from
  * the identical (doc_id, pos, h) 20-gram table over documents — the
  * dominant cost of both (the full-corpus explode + md5). One
  * materialization per session+input serves both, REPARTITIONED BY h
  * before the checkpoint so each consumer's h-keyed window reuses the
  * layout without a new exchange — the in-process analog of persisting
  * the gram index to a bucketed table between pipeline stages.
  * Deterministic (md5 of text), so cached == recomputed bit-for-bit. */
object SharedGrams {

  val N = 20

  private final case class Key(session: SparkSession, dir: String, n: Int)
  private val cache = TrieMap.empty[Key, DataFrame]

  def grams(s: SparkSession, dir: String, n: Int = N): DataFrame =
    cache.getOrElseUpdate(Key(s, dir, n),
      ArtifactTimer.timed("SharedGrams.grams")(
      operators.DupSpans.grams(Tables.documents(s, dir), "doc_id", "text", n)
        .repartition(org.apache.spark.sql.functions.col("h"))
        .localCheckpoint()))

  /** The boilerplate sentinel q55/q196 append to every 7th document —
    * one constant so the detector and the rewriter can never drift. */
  val BoilerSentinel = "all rights reserved contact site admin for removal"

  /** Sentinel-injected (doc_id, lang, txt) projection — cheap map over
    * the scan, not cached; both boilerplate consumers derive from it. */
  def sentinelDocs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      when(col("doc_id") % 7 === 0,
        concat_ws(" ", col("text"), lit(BoilerSentinel)))
        .otherwise(col("text")).as("txt"))
  }

  private val sentCache = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Word-8-gram position rows (doc_id, p, 16-byte gh) over the
    * sentinel corpus — the shared first stage of the boilerplate
    * detect (q55) → rewrite (q196) pairing. One materialization per
    * session+input: each consumer otherwise re-runs the full scan +
    * tokenize + slice-join + md5 explosion, which the r7 plan audit
    * measured as the dominant cost of both. gh rides as BINARY(16)
    * (unhex'd md5) — half the hex string's exchange width. */
  def sentinel8(s: SparkSession, dir: String): DataFrame =
    sentCache.getOrElseUpdate((s, dir),
      ArtifactTimer.timed("SharedGrams.sentinel8")( {
      import org.apache.spark.sql.functions._
      sentinelDocs(s, dir)
        .select(col("doc_id"), posexplode(
          operators.TextAnalysis.wordNgrams(col("txt"), 8))
          .as(Seq("pos0", "g")))
        .select(col("doc_id"), (col("pos0") + 1).as("p"),
          unhex(md5(col("g"))).as("gh"))
        .localCheckpoint()
    }))

  /** The shared-8-gram similarity-graph edge list (q144 triangle
    * census + q145 degree histogram — and triangleCensus alone
    * consumes it five times: three join legs, degrees, edge count).
    * Bounded by construction (df ∈ [2,10] ⇒ ≤ C(10,2) pairs per
    * gram), so the checkpoint is small however large the corpus. */
  private val edgeCache = TrieMap.empty[(SparkSession, String), DataFrame]

  def gramEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate((s, dir),
      ArtifactTimer.timed("SharedGrams.gramEdges")(
      operators.Curation.sharedGramEdges(
        Tables.documents(s, dir), "doc_id", "text", n = 8, maxDf = 10)
        .localCheckpoint()))

  /** The checkpointed (postings, doc-lengths) pair PRF reads four
    * times (q148) — one materialization per session+input, like every
    * other corpus-sized shared artifact, so repeated query runs reuse
    * one copy instead of checkpointing per invocation. */
  private val postCache =
    TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  def postingPair(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    postCache.getOrElseUpdate((s, dir),
      ArtifactTimer.timed("SharedGrams.postingPair")( {
      val docs = Tables.documents(s, dir)
      import org.apache.spark.sql.functions.{col => c}
      (operators.TrainPrep.termDocs(docs).localCheckpoint(),
        docs.select(c("doc_id"),
          operators.TextAnalysis.tokenCount(c("text")).cast("long")
            .as("dl")).localCheckpoint())
    }))

  /** Raw word-8-gram occurrence rows (doc_id, source, gh BINARY(16))
    * over the documents table — the gram-index build input shared by
    * q219 (df/occurrence saturation curve), q220 (delta novelty) and
    * q233 (index aging): each re-ran the full scan + tokenize +
    * slice + md5 per invocation (the dominant cost of all three); the
    * artifact is the occurrence log a production gram index ingests.
    * gh rides as BINARY(16) (unhex'd md5) — half the hex string's
    * width (the sentinel8 discipline). */
  private val w8Cache = TrieMap.empty[(SparkSession, String), DataFrame]

  def word8(s: SparkSession, dir: String): DataFrame =
    w8Cache.getOrElseUpdate((s, dir),
      ArtifactTimer.timed("SharedGrams.word8")( {
      import org.apache.spark.sql.functions._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          explode(operators.TextAnalysis.wordNgrams(col("text"), 8))
            .as("g"))
        .select(col("doc_id"), col("source"),
          unhex(md5(col("g"))).as("gh"))
        .localCheckpoint()
    }))

  /** The positional posting table (term, doc_id, pos) — the second
    * stored index artifact next to [[postingPair]] (TrainPrep's
    * writePositionsBucketed form): q112's phrase intersection and
    * q121's proximity bonus both read it; each invocation otherwise
    * re-tokenized the corpus with positions. */
  private val posCache = TrieMap.empty[(SparkSession, String), DataFrame]

  def termPositions(s: SparkSession, dir: String): DataFrame =
    posCache.getOrElseUpdate((s, dir),
      ArtifactTimer.timed("SharedGrams.termPositions")(
      operators.TrainPrep.termPositions(Tables.documents(s, dir))
        .localCheckpoint()))

  def clear(): Unit = synchronized {
    (cache.values ++ edgeCache.values ++ sentCache.values ++
      posCache.values ++
      postCache.values.flatMap(p => Seq(p._1, p._2))).foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
    edgeCache.clear()
    sentCache.clear()
    postCache.clear()
    posCache.clear()
    w8Cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    w8Cache.clear()
  }
}

/** Same artifact-sharing move for the embedding-space dedup pipeline:
  * q91's component map (cosine near-dup pairs → connected components)
  * is a deterministic function of the embeddings table — the CC loop's
  * fixed per-round driver cost dominates its tiny input, so one
  * materialization per session+input serves every consumer, exactly as
  * SharedLsh.components does for the MinHash pipeline. */
object SharedCosineCC {

  final case class Params(bits: Int, threshold: Double)
  val Default: Params = Params(bits = 8, threshold = 0.3)

  private final case class Key(session: SparkSession, dir: String, p: Params)
  private val cache = TrieMap.empty[Key, DataFrame]

  import org.apache.spark.sql.functions.col
  import graft.operators.{Dedup, Similarity}

  /** Materialized (doc_id, component) map over cosine near-dup pairs. */
  def components(s: SparkSession, dir: String,
                 p: Params = Default): DataFrame =
    cache.getOrElseUpdate(Key(s, dir, p),
      ArtifactTimer.timed("SharedCosineCC.components")(
      Dedup.connectedComponents(
        Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
            p.bits, p.threshold)
          .select(col("va").as("doc_a"), col("vb").as("doc_b")))
        .localCheckpoint()))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
  }
}

/** Same artifact-sharing move for the IVF oracle suite: the exact-
  * decimal cell assignment over the embeddings table is the dominant
  * cost of BOTH q47 (census over it) and q48 (inverted file for the
  * search) — one materialization per session+input serves both, the
  * in-process analog of persisting the inverted file to parquet. */
object SharedIvf {

  val Stride = 97

  private final case class Key(session: SparkSession, dir: String)
  private val cache =
    TrieMap.empty[Key, org.apache.spark.sql.DataFrame]

  import org.apache.spark.sql.functions.col
  import graft.operators.Similarity

  def vectors(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("v"))

  def centroids(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    vectors(s, dir).filter(col("id") % Stride === 0)
      .select((col("id") / Stride).cast("long").as("cid"), col("v").as("cv"))

  /** Materialized (id, cid) exact-decimal assignment. */
  def assignment(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    cache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedIvf.assignment")(
      Similarity.assignL2Decimal(vectors(s, dir), centroids(s, dir))
        .localCheckpoint()))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
  }
}

/** Product-quantization artifacts shared by q92/q93/q95: the
  * exact-decimal code assignment is the expensive stage (a window over
  * N·m·ksub candidate rows), and all three queries are views over it —
  * same persist-between-stages move as [[SharedIvf]]. Deterministic
  * function of the input (stride codebook + decimal argmin), so a
  * cached read equals a recompute bit-for-bit. */
object SharedPq {

  val M = 4
  val Dsub = 16
  val Stride = 29

  private final case class Key(session: SparkSession, dir: String)
  private val cache =
    TrieMap.empty[Key, org.apache.spark.sql.DataFrame]

  import graft.operators.ProductQuant

  def codebook(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    ProductQuant.codebookByStride(SharedIvf.vectors(s, dir), M, Dsub, Stride)

  /** Materialized (id, j, code) exact-decimal PQ encoding. */
  def encoded(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    cache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedPq.encoded")(
      ProductQuant.encodeDecimal(SharedIvf.vectors(s, dir),
        codebook(s, dir), M, Dsub).localCheckpoint()))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
  }
}

/** Corpus-trained bigram-LM score column — the CCNet-style quality
  * signal: (doc_id, lm_score) for EVERY document under the LM trained
  * on the corpus itself. Shared by q103 (exact tercile buckets) and
  * the t-digest approximate twin (`ccnetBucketsApprox`, the
  * CcnetApproxSpec / scale surface); the scoring pass (unigram +
  * bigram corpus aggregations joined per token occurrence) dominates
  * both, and the score column is precisely what a CCNet pipeline
  * materializes once and filters/buckets many ways. Deterministic
  * (integer fixed-point), so a cached read equals a recompute. */
object SharedLm {

  private final case class Key(session: SparkSession, dir: String)
  private val cache = TrieMap.empty[Key, DataFrame]

  def scored(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedLm.scored")( {
      val docs = Tables.documents(s, dir)
      operators.NgramLm.score(docs, docs).localCheckpoint()
    }))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
  }
}

/** DSIR importance-score artifact shared by q118 (top-25 selection)
  * and q137 (global top-p% cut): both score EVERY document with the
  * identical hashed-bigram importance-weight model (target = docs
  * containing 'spark'), and the scoring pass — two corpus-wide bigram
  * aggregations plus a per-occurrence weight join — is the dominant
  * cost of both. The (doc_id, avg_weight_fp) frame is precisely the
  * score column a DSIR selection pipeline materializes once and then
  * ranks/cuts many ways. Deterministic (md5 bucket hashing, integer
  * fixed-point), so a cached read equals a recompute bit-for-bit. */
object SharedDsir {

  private final case class Key(session: SparkSession, dir: String)
  private val cache = TrieMap.empty[Key, DataFrame]

  def scored(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDsir.scored")( {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val target = docs.filter(col("text").contains("spark"))
      operators.Dsir.scoreDocs(docs,
        operators.Dsir.importanceWeights(docs, target))
        .localCheckpoint()
    }))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
  }
}

/** Benchmark-decontamination shared artifacts — the r12-opt factoring
  * of what q199 (LSH screen + shingle-Jaccard confirm), q234 (winnow
  * screen + containment confirm) and q235 (both screens, one confirm)
  * each re-derived per invocation. Every piece is a deterministic
  * function of the documents table under the FROZEN q199/q234
  * benchmark convention (doc_id % 13, tail-trimmed, ids offset by
  * 10¹²), so a cached read equals a recompute bit-for-bit — and each
  * artifact is precisely what a production decontamination pipeline
  * persists between stages: the benchmark-side fingerprint/band
  * indexes (rebuilt only when the benchmark set changes, not per
  * corpus batch), the screened candidate-pair sets, and the
  * verification-stage shingle rows for candidate docs only (the
  * SharedLsh.candidateShingleRows move).
  *
  * Measured (r12 opt round, sf0.1, within one JVM): the three queries
  * spent 3.7 + 2.2 + 2.5 s/pass re-deriving these; as shared
  * artifacts the per-pass residue is the per-query census/confirm
  * legs only. */
object SharedDecontam {

  import org.apache.spark.sql.functions._

  /** Bench ids live at doc_id + 10¹² — the q199 constant, shared
    * verbatim with every consumer's oracle SQL. */
  val BenchIdBase = 1000000000000L

  private final case class Key(session: SparkSession, dir: String)

  /** The injected pseudo-benchmark set (q199/q234/q235 convention):
    * every doc_id % 13 == 0 contributes a tail-trimmed copy under
    * doc_id + 10¹². Cheap map over the scan; not cached. */
  def benchDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + BenchIdBase).as("doc_id"),
        expr("substr(text, 1, greatest(length(text)-40, 50))").as("text"))

  /** Corpus winnow fingerprints under the train-side alias — a rename
    * VIEW over [[SharedWinnow.fpDoc]] (no extra materialization; the
    * per-query `.distinct().localCheckpoint()` copies q234/q235 each
    * paid duplicated the existing artifact exactly). */
  def corpusFp(s: SparkSession, dir: String): DataFrame =
    SharedWinnow.fpDoc(s, dir)
      .select(col("doc_id").as("train_id"), col("fp"))

  private val benchFpCache = TrieMap.empty[Key, DataFrame]

  /** Distinct (bench_id, fp) winnow fingerprints of the benchmark set
    * — the bench-side index a decontamination service stores. */
  def benchFp(s: SparkSession, dir: String): DataFrame =
    benchFpCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.benchFp")(
      SharedWinnow.fingerprintsOf(benchDocs(s, dir))
        .select(col("doc_id").as("bench_id"), col("fp")).distinct()
        .localCheckpoint()))

  private val benchBandCache = TrieMap.empty[Key, DataFrame]

  /** (bench_id, bk) LSH band keys of the benchmark set (q17's
    * n=5/k=8/2-band scheme) — benchmark-sized by construction, the
    * only broadcastable frame in this family (the q199 rule). */
  def benchBands(s: SparkSession, dir: String): DataFrame =
    benchBandCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.benchBands")(
      Dedup.lshBandKeysNarrow(benchDocs(s, dir), "doc_id", "text", 5, 8, 2)
        .select(col("doc_id").as("bench_id"), col("bk"))
        .localCheckpoint()))

  private val lshCrossCache = TrieMap.empty[Key, DataFrame]

  /** LSH-screened cross pairs (train_id, bench_id): corpus band table
    * (session artifact) ⋈ broadcast bench band index, distinct. The
    * intra-corpus candidate pairs are never generated. */
  def lshCrossPairs(s: SparkSession, dir: String): DataFrame =
    lshCrossCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.lshCrossPairs")(
      SharedLsh.bandKeys(s, dir)
        .select(col("doc_id").as("train_id"), col("bk"))
        .join(broadcast(benchBands(s, dir)), "bk")
        .select(col("train_id"), col("bench_id")).distinct()
        .localCheckpoint()))

  private val winnowCandCache = TrieMap.empty[Key, DataFrame]

  /** Winnow-screened cross pairs: ≥2 shared fingerprints in the
    * df-capped universe (corpus-side df ≤ StreamingWinnowScreen.DfCap)
    * — q234's screen, reused verbatim by q235. No data-dependent
    * broadcast: every leg is a shuffle-hash equi-join (candidate
    * volume scales with contamination rate × corpus size). */
  def winnowCandPairs(s: SparkSession, dir: String): DataFrame =
    winnowCandCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.winnowCandPairs")( {
      val DfCap = graft.streaming.StreamingWinnowScreen.DfCap
      val cfp = corpusFp(s, dir)
      val capped = cfp.join(
        cfp.groupBy(col("fp")).agg(count(lit(1)).as("dfc"))
          .filter(col("dfc") <= DfCap).select(col("fp"))
          .hint("shuffle_hash"), "fp")
      capped
        .join(benchFp(s, dir).hint("shuffle_hash"), "fp")
        .groupBy(col("train_id"), col("bench_id"))
        .agg(count(lit(1)).as("nsh"))
        .filter(col("nsh") >= 2)
        .select(col("train_id"), col("bench_id"))
        .localCheckpoint()
    }))

  private val confirmedCache = TrieMap.empty[Key, DataFrame]

  /** Containment-confirmed pairs (uncapped winnow-fingerprint
    * containment of the bench doc in the train doc ≥ 50%, integer
    * ppm) over the UNION of both screens' candidates. The confirm
    * predicate is per-pair and independent of which screen surfaced
    * the pair, so one confirm pass serves q234 (restricted back to
    * the winnow candidates by a semi-join) and q235 (read as-is) —
    * the ruleCompare move: one fenced kernel pass, two consumers. */
  def confirmedPairs(s: SparkSession, dir: String): DataFrame =
    confirmedCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.confirmedPairs")( {
      val cand = winnowCandPairs(s, dir).union(lshCrossPairs(s, dir))
        .distinct()
      val cfp = corpusFp(s, dir)
      val bfp = benchFp(s, dir)
      val inter = cfp
        .join(cand.hint("shuffle_hash"), "train_id")
        .join(bfp.hint("shuffle_hash"), Seq("bench_id", "fp"))
        .groupBy(col("train_id"), col("bench_id"))
        .agg(count(lit(1)).as("i"))
      val szb = bfp.groupBy(col("bench_id")).agg(count(lit(1)).as("szb"))
      inter.join(szb.hint("shuffle_hash"), "bench_id")
        .filter(expr("i * 1000000 div szb") >= 500000L)
        .select(col("train_id"), col("bench_id"))
        .localCheckpoint()
    }))

  private val candShCache = TrieMap.empty[Key, DataFrame]

  /** Distinct (doc_id, 5-char shingle) rows for the LSH-screened
    * candidate docs (train AND bench side) — q199's exact-confirm
    * input, the verification-stage artifact
    * (SharedLsh.candidateShingleRows's move for the cross-set
    * screen). Bounded by candidate volume × doc length. */
  def candShingles(s: SparkSession, dir: String): DataFrame =
    candShCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedDecontam.candShingles")( {
      val cross = lshCrossPairs(s, dir)
      val cdocs = cross.select(col("train_id").as("doc_id"))
        .union(cross.select(col("bench_id"))).distinct()
      val corpus = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .union(benchDocs(s, dir))
      corpus.join(cdocs.hint("shuffle_hash"), "doc_id")
        .select(col("doc_id"),
          explode(Dedup.charShingles(col("text"), 5)).as("sh"))
        .distinct()
        .localCheckpoint()
    }))

  def clear(): Unit = synchronized {
    (benchFpCache.values ++ benchBandCache.values ++
      lshCrossCache.values ++ winnowCandCache.values ++
      confirmedCache.values ++ candShCache.values).foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    benchFpCache.clear()
    benchBandCache.clear()
    lshCrossCache.clear()
    winnowCandCache.clear()
    confirmedCache.clear()
    candShCache.clear()
  }
}

/** BPE merge tables shared by q97 (training readout) and q99 (corpus
  * encode): training is `rounds` driver-coordinated passes over the
  * vocabulary, and both queries need the identical merge list — the
  * learned table is driver-sized metadata (like a centroid set), so
  * the cache holds the Seq itself, not a frame. Deterministic (integer
  * counts, total tiebreak), so a cached read equals a retrain. */
object SharedBpe {

  private final case class Key(session: SparkSession, dir: String, rounds: Int)
  private val cache =
    TrieMap.empty[Key, Seq[(Int, String, String, Long)]]

  def merges(s: SparkSession, dir: String,
             rounds: Int): Seq[(Int, String, String, Long)] =
    cache.getOrElseUpdate(Key(s, dir, rounds),
      ArtifactTimer.timed("SharedBpe.merges")(
      graft.operators.BpeTrain.merges(
        graft.operators.BpeTrain.wordFreqs(Tables.documents(s, dir), "text"),
        rounds)))

  def clear(): Unit = cache.clear()
}

/** Winnowed-fingerprint artifact shared by q223 (density census) and
  * q226 (screen calibration): the SELECTED rows — per (doc, window)
  * the minimum word-4-gram hash32, with the doc's source and gram
  * count carried for the census consumers. The gram pass + 4× window
  * fan-out + (doc, window) min-agg is the expensive stage (the suite
  * tail before this cache: 4.4 s + 5.6 s each re-deriving it at
  * sf0.1); both consumers are cheap views over the selected rows —
  * the same move as SharedLsh's band table. Deterministic (md5
  * hashes, exact min), so a cached read equals a recompute. */
object SharedWinnow {

  private final case class Key(session: SparkSession, dir: String)
  private val cache = TrieMap.empty[Key, DataFrame]

  /** (doc_id, source, ng, j, fp, spos) — winnowing window w = 4 over
    * word 4-grams; `fp` is the window's minimum hash, `spos` the
    * RIGHTMOST gram position carrying it (Schleimer et al.'s tie
    * rule — the position census q229 needs; value-set consumers
    * ignore it). Docs with fewer than 4 grams carry no rows. */
  def selected(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedWinnow.selected")(
      fingerprintsOf(Tables.documents(s, dir), Seq("source"))
        .localCheckpoint()))

  /** The winnowing selection kernel over any (doc_id, text, extras…)
    * frame — factored out so ad-hoc sides (q234's truncated benchmark
    * set) winnow with the EXACT expressions the cached corpus artifact
    * uses; a drifted copy would silently break the shared-span
    * guarantee between the two sides of a screen. Returns
    * (doc_id, extras…, ng, j, fp, spos); not cached. */
  def fingerprintsOf(docs: DataFrame, extras: Seq[String] = Nil)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.{KmvSketch, TextAnalysis}
    val w = 4
    val ex = extras.map(col)
    val win = docs
      .select(col("doc_id") +: ex :+
        TextAnalysis.wordNgrams(col("text"), 4).as("gs"): _*)
      .select(col("doc_id") +: ex :+
        size(col("gs")).cast("long").as("ng") :+ posexplode(col("gs")): _*)
      .filter(col("ng") >= w)
      .select(col("doc_id") +: ex :+ col("ng") :+
        col("pos").cast("long").as("p") :+
        KmvSketch.hash32(col("col")).as("h"): _*)
      .select(col("doc_id") +: ex :+ col("ng") :+ col("h") :+ col("p") :+
        explode(sequence(greatest(col("p") - 3, lit(0L)),
          least(col("p"), col("ng") - w))).as("j"): _*)
    win
      .groupBy(col("doc_id") +: ex :+ col("ng") :+ col("j"): _*)
      .agg(min(col("h")).as("fp"),
        // rightmost minimal: max p among rows tying the window min
        // — min_by on (h asc, -p asc) picks exactly that row's p
        min_by(col("p"), struct(col("h"), (-col("p")).as("np")))
          .as("spos"))
  }

  private val fpDocCache = TrieMap.empty[Key, DataFrame]

  /** Distinct (doc_id, fp) winnowed fingerprints, checkpointed —
    * ONE kernel pass feeding every cap variant's df filter and both
    * self-join legs (before the factor-out, each cap paid its own
    * gram+hash+fold kernel). */
  def fpDoc(s: SparkSession, dir: String): DataFrame =
    fpDocCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedWinnow.fpDoc")( {
      import org.apache.spark.sql.functions._
      selected(s, dir)
        .select(col("doc_id"), col("fp")).distinct()
        .localCheckpoint()
    }))

  private val capCache = TrieMap.empty[Key, Long]

  /** The DUPLICATION-AWARE screen cap (r11 verdict item 1): the fixed
    * [[graft.streaming.StreamingWinnowScreen.DfCap]] silently drops
    * real duplicate families once corpus duplication grows — a
    * fingerprint shared by an f-doc organic family has df ≈ m·f under
    * m-fold duplication, so the boilerplate threshold must scale with
    * the MEASURED duplication rate. Multiplier = exact-duplicate
    * multiplicity (rows / distinct text hashes — one cheap md5
    * distinct-count, far cheaper than the near-dup map the cap
    * gates); adaptive cap = ceil(DfCap · n / m), all-integer so both
    * engines agree: (DfCap·n + m − 1) div m. On organic driver data
    * the multiplier ≈ 1 and the cap stays ≈ DfCap; at 10× synth
    * replication it scales to ~160 and keeps the cross-source
    * families the fixed cap loses (q246's vanishing components). */
  def adaptiveCap(s: SparkSession, dir: String): Long =
    capCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedWinnow.adaptiveCap")( {
      import org.apache.spark.sql.functions._
      val r = Tables.documents(s, dir)
        .agg(count(lit(1)).as("n"),
          count_distinct(md5(col("text"))).as("m"))
        .head()
      val (n, m) = (r.getLong(0), r.getLong(1))
      val base = graft.streaming.StreamingWinnowScreen.DfCap.toLong
      // empty corpus → the fixed cap (the capFromStore fallback rule)
      if (m == 0L) base else (base * n + m - 1L) / m
    }))

  private val pairCache = TrieMap.empty[(Key, Long), DataFrame]

  /** [[cappedPairs]] at an explicit df-cap — the parameterized screen
    * variant the adaptive cap plugs into; cached per (session, dir,
    * cap) so the fixed-cap consumers (q226/q238, gate-frozen) and the
    * adaptive consumers (q251) each pay their pair join once while
    * sharing ONE [[fpDoc]] kernel pass. */
  def cappedPairsAt(s: SparkSession, dir: String, cap: Long): DataFrame =
    pairCache.getOrElseUpdate((Key(s, dir), cap),
      ArtifactTimer.timed("SharedWinnow.cappedPairsAt")( {
      import org.apache.spark.sql.functions._
      val fpdoc = fpDoc(s, dir)
      val usable = fpdoc.groupBy(col("fp"))
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd").between(2L, cap))
        .select(col("fp"))
      val capped = fpdoc.join(usable.hint("shuffle_hash"), "fp")
      capped.select(col("fp"), col("doc_id").as("doc_a"))
        .join(capped.select(col("fp"), col("doc_id").as("doc_b"))
          .hint("shuffle_hash"), Seq("fp"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("nshared"))
        .filter(col("nshared") >= 2)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    }))

  /** The df-capped ≥2-shared winnow candidate-pair artifact —
    * distinct (doc, fp) from [[selected]], document frequency capped
    * at [2, StreamingWinnowScreen.DfCap], capped-bucket self-join,
    * pairs sharing ≥ 2 fingerprints. Shared by q226 (screen
    * calibration) and q238 (dedup retention): the pair derivation is
    * the expensive stage, both consumers are views over it. Forced
    * shuffle on the self-join legs (scale lesson #4 — broadcast would
    * pin output parallelism). */
  def cappedPairs(s: SparkSession, dir: String): DataFrame =
    cappedPairsAt(s, dir,
      graft.streaming.StreamingWinnowScreen.DfCap.toLong)

  private val compCache = TrieMap.empty[(Key, Long), DataFrame]

  /** [[components]] at an explicit df-cap — cached per cap for the
    * adaptive-screen consumers. */
  def componentsAt(s: SparkSession, dir: String, cap: Long): DataFrame =
    compCache.getOrElseUpdate((Key(s, dir), cap),
      ArtifactTimer.timed("SharedWinnow.componentsAt")(
      graft.operators.Dedup.connectedComponents(
        cappedPairsAt(s, dir, cap)).localCheckpoint()))

  /** Exact connected components over [[cappedPairs]] — the winnow
    * screen's cluster map, cached like SharedLsh.components (q238's
    * retention and q242's cluster profile read the same map). */
  def components(s: SparkSession, dir: String): DataFrame =
    componentsAt(s, dir,
      graft.streaming.StreamingWinnowScreen.DfCap.toLong)

  private val compWhereCache = TrieMap.empty[(Key, String), DataFrame]

  /** [[components]] over a RESTRICTED document universe (`predSql`
    * filters the documents table) — q249's base-world map, cached per
    * (session, dir, predicate) so the kernel + CC fixpoint run once
    * per session (lesson #8: q249's first bench entry re-paid them
    * every pass, 5.8 s of which ~5.5 s was this derivation). Uses the
    * streaming twin's `fingerprintsNarrow` kernel — parity with the
    * [[selected]]-based derivation is spec-pinned elsewhere
    * (StreamingWinnowScreenSpec), and q249's oracle replays the same
    * rule from scratch, so the cache cannot drift silently. */
  def componentsWhere(s: SparkSession, dir: String,
                      predSql: String): DataFrame =
    compWhereCache.getOrElseUpdate((Key(s, dir), predSql),
      ArtifactTimer.timed("SharedWinnow.componentsWhere")( {
      import org.apache.spark.sql.functions._
      val cap = graft.streaming.StreamingWinnowScreen.DfCap
      val fd = graft.streaming.StreamingWinnowScreen
        .fingerprintsNarrow(
          Tables.documents(s, dir).filter(expr(predSql)),
          "doc_id", "text")
        .select(col("docId").as("doc_id"), col("fp")).distinct()
        .localCheckpoint() // df-cap + both self-join legs, one lineage
      val usable = fd.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
        .filter(col("nd").between(2, cap))
        .select(col("fp"))
      val capped = fd.join(usable.hint("shuffle_hash"), "fp")
      graft.operators.Dedup.connectedComponents(
        capped.select(col("fp"), col("doc_id").as("doc_a"))
          .join(capped.select(col("fp"), col("doc_id").as("doc_b"))
            .hint("shuffle_hash"), Seq("fp"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("nsh"))
          .filter(col("nsh") >= 2)
          .select(col("doc_a"), col("doc_b")))
        .localCheckpoint()
    }))

  private val ruleCache = TrieMap.empty[Key, DataFrame]

  /** Per-doc BOTH-tie-rule fingerprint artifact — (doc_id, source,
    * nw, n_std, n_rob, sv, rv): distinct position counts and sorted
    * distinct VALUE arrays under the standard (rightmost-min) and
    * robust (Schleimer §5) rules, from ONE pass of the fenced
    * winnowInput kernel. q231 (position census) and q236 (value-index
    * certificate + shared-fp screen) previously each paid the full
    * gram+hash+double-fold kernel (~1.3 s each materialized at
    * sf0.1); the artifact is the per-doc fp VALUE index a production
    * screen stores anyway, so sharing it is the storage reality, not
    * just a cache. */
  def ruleCompare(s: SparkSession, dir: String): DataFrame =
    ruleCache.getOrElseUpdate(Key(s, dir),
      ArtifactTimer.timed("SharedWinnow.ruleCompare")( {
      import org.apache.spark.sql.functions._
      QueriesRound9.winnowInput(s, dir)
        .select(col("doc_id"), col("source"), col("nw"),
          size(QueriesRound9.stdSelCol).cast("long").as("n_std"),
          size(QueriesRound9.robSelCol).cast("long").as("n_rob"),
          array_sort(array_distinct(transform(QueriesRound9.stdSelCol,
            p => element_at(col("hs"), p.cast("int")).cast("long"))))
            .as("sv"),
          array_sort(array_distinct(transform(QueriesRound9.robSelCol,
            p => element_at(col("hs"), p.cast("int")).cast("long"))))
            .as("rv"))
        .localCheckpoint()
    }))

  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    cache.clear()
    fpDocCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    fpDocCache.clear()
    capCache.clear()
    pairCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    pairCache.clear()
    compCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    compCache.clear()
    ruleCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    ruleCache.clear()
    compWhereCache.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    compWhereCache.clear()
  }
}
