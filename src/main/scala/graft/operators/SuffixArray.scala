package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix array over a document corpus — the full
  * exact-substring-dedup machinery (the suffix-array line of work in
  * PAPERS.md): rank every suffix of every document in global
  * lexicographic order, then read repeated-substring structure off
  * adjacent ranks. This is the upgrade path ExactSubstring documents:
  * q86's gram cover is character-exact for SPAN EXTENTS at one fixed
  * length; the suffix array additionally yields per-position MATCH
  * LENGTHS ([[longestRepeatPerDoc]]).
  *
  * Construction is prefix DOUBLING (Manber–Myers, the standard
  * distributed SA recipe): rank by first character, then repeatedly
  * re-rank by the pair (rank of first half, rank of second half) until
  * the compared prefix reaches `maxLen` — ⌈log₂ maxLen⌉ rounds, each
  * one range-shuffle + one window, all integer after round one.
  * Suffixes are compared as BOUNDED prefixes (first `maxLen` chars,
  * ties = identical bounded prefixes share a rank) — which is exactly
  * `DENSE_RANK() OVER (ORDER BY substr(text, pos, maxLen))`, the
  * oracle-expressible contract q87 pins; repeated-substring readout
  * is correspondingly capped at maxLen.
  *
  * Scale shape:
  *  - the global sort each round is a RANGE shuffle (no single-task
  *    window): dense ranks come from the two-phase scheme — range
  *    partition by key, per-partition dense_rank, add per-partition
  *    distinct-count offsets (the WeightedSample.withCumWeight move,
  *    incl. its localCheckpoint-before-collect AQE pin). Equal keys
  *    land in one range partition, so cross-partition ties cannot
  *    split a rank.
  *  - pair keys pack into one long (r1·(n+1)+r2, order- and
  *    equality-preserving); requires n < ~3·10⁹ positions per build —
  *    past that, swap the packed key for a two-column range sort.
  *  - each level is localCheckpoint'd: the doubling recursion and the
  *    LCP descent read materialized levels, keeping lineage flat —
  *    on a cluster these levels are exactly what lands in a parquet
  *    stage directory between rounds.
  */
object SuffixArray {

  /** All doubling levels, k = 1, 2, 4, …, maxLen; each frame is
    * (doc_id, pos, rank) with rank = dense rank of the k-bounded
    * suffix prefix. [[levels]].last is the maxLen-bounded ranking. */
  final case class Index(levels: Seq[(Int, DataFrame)], maxLen: Int) {
    def ranks: DataFrame = levels.last._2
  }

  /** Distributed dense rank (1-based, Long) of `key`'s global order:
    * range partition → per-partition dense_rank → broadcast offsets. */
  private def denseRankBy(df: DataFrame, key: Column,
                          buckets: Int): DataFrame = {
    val ranged = df.withColumn("_k", key)
      .repartitionByRange(buckets, col("_k"))
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(col("_b")).orderBy(col("_k"))
    val local = ranged.withColumn("_lr", dense_rank().over(w).cast("long"))
    val totals = local.groupBy(col("_b")).agg(max(col("_lr")).as("_t"))
      .orderBy(col("_b")).collect()
    local.withColumn("rank",
        col("_lr") + WeightedSample.bucketOffsetCol(totals, col("_b")))
      .drop("_k", "_b", "_lr")
  }

  /** Build the index. `maxLen` and `startLen` must be powers of two.
    *
    * `startLen` trades ladder depth for LCP resolution: the first
    * ranking compares `startLen`-char prefixes directly (string range
    * sort — shorter-is-less semantics are exactly string comparison),
    * so the build runs log₂(maxLen/startLen)+1 ranking rounds instead
    * of log₂(maxLen)+1. Rank-only consumers (q87) want startLen = 8;
    * [[longestRepeatPerDoc]] needs the FULL ladder (startLen = 1) —
    * its LCP descent resolves in level-size units. */
  def build(docs: DataFrame, idCol: String, textCol: String, maxLen: Int,
            buckets: Int = 32, startLen: Int = 1): Index = {
    require(maxLen >= 2 && (maxLen & (maxLen - 1)) == 0,
      "maxLen must be a power of two")
    require(startLen >= 1 && (startLen & (startLen - 1)) == 0 &&
      startLen <= maxLen, "startLen must be a power of two <= maxLen")
    val base = docs
      .where(length(col(textCol)) >= 1) // sequence(1,0) would DESCEND
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length($textCol)), " +
            s"i -> substring($textCol, i, $startLen))")).as(Seq("pos0", "c")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("c"))
      // materialize the explode once: the first denseRankBy's range
      // partitioner SAMPLES its input before the shuffle, which
      // otherwise re-evaluates the whole per-position substring
      // explode a second time (r12 opt — the ladder levels are
      // already checkpointed for the same reason)
      .localCheckpoint()
    // position count from the cheap pre-explode scan; sum() over an
    // empty frame is NULL — an empty corpus builds an empty index
    val nRow = docs.where(length(col(textCol)) >= 1)
      .agg(sum(length(col(textCol)).cast("long"))).collect()(0)
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n < 3000000000L,
      s"packed pair keys need n < 3e9 positions, got $n — " +
        "use a two-column range sort past that")
    var k = startLen
    var cur = denseRankBy(base, col("c"), buckets)
      .select(col("doc_id"), col("pos"), col("rank"))
      .localCheckpoint()
    val levels = Seq.newBuilder[(Int, DataFrame)]
    levels += (k -> cur)
    while (k < maxLen) {
      // rank of the suffix half starting k later; 0 = past doc end,
      // which orders shorter-prefix-first and never collides with a
      // real rank (those are >= 1)
      val shifted = cur.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("_r2"))
      val joined = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"),
          (col("rank") * (n + 1) + coalesce(col("_r2"), lit(0L))).as("_pk"))
      cur = denseRankBy(joined, col("_pk"), buckets)
        .select(col("doc_id"), col("pos"), col("rank"))
        .localCheckpoint()
      k *= 2
      levels += (k -> cur)
    }
    Index(levels.result(), maxLen)
  }

  /** (doc_id, pos, rank): dense rank of each maxLen-bounded suffix. */
  def suffixRanks(docs: DataFrame, idCol: String, textCol: String,
                  maxLen: Int, buckets: Int = 32,
                  startLen: Int = 1): DataFrame =
    build(docs, idCol, textCol, maxLen, buckets, startLen).ranks

  /** LCP of each adjacent rank pair (r, r+1), by descending the stored
    * levels: ranks agreeing at level k ⇒ the first k chars match ⇒
    * advance both cursors k and add k. LCP depends only on the RANK
    * pair (equal ranks = equal content), so the descent runs on one
    * representative per rank — n_ranks rows, not n positions. */
  private def adjacentLcp(index: Index): DataFrame = {
    require(index.levels.head._1 == 1,
      "LCP descent needs the full level ladder — build with startLen = 1")
    val reps = index.ranks
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("rank")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("_rn") === 1)
      .select(col("rank"), col("doc_id").as("da"), col("pos").as("pa"))
    var cur = reps.join(
        reps.select((col("rank") - 1).as("rank"), col("da").as("db"),
          col("pa").as("pb")),
        "rank")
      .withColumn("lcp", lit(0L))
    // skip level maxLen: adjacent DISTINCT ranks cannot agree there
    index.levels.takeWhile(_._1 < index.maxLen).sortBy(-_._1)
      .foreach { case (k, tbl) =>
        val ta = tbl.select(col("doc_id").as("da"), col("pos").as("_qa"),
          col("rank").as("_ra"))
        val tb = tbl.select(col("doc_id").as("db"), col("pos").as("_qb"),
          col("rank").as("_rb"))
        cur = cur
          .join(ta, cur("da") === ta("da") &&
            (cur("pa") + cur("lcp")) === ta("_qa"), "left")
          .drop(ta("da"))
          .join(tb, cur("db") === tb("db") &&
            (cur("pb") + cur("lcp")) === tb("_qb"), "left")
          .drop(tb("db"))
          .withColumn("lcp",
            when(col("_ra").isNotNull && col("_ra") === col("_rb"),
              col("lcp") + k).otherwise(col("lcp")))
          .drop("_ra", "_rb")
      }
    cur.select(col("rank"), col("lcp"))
  }

  /** Character common-prefix length of two non-null strings — a pure
    * codegen'd expression (first differing position, else the shorter
    * length). O(maxLen²) char probes per pair; fine for the bounded
    * prefixes it's used on (≤ 32 chars ⇒ ≤ 1k probes). */
  private def commonPrefixLen(a: Column, b: Column): Column = {
    val m = least(length(a), length(b)).cast("int")
    val firstDiff = filter(
      sequence(lit(1), m),
      i => a.substr(i, lit(1)) =!= b.substr(i, lit(1)))
    // no differing position ⇒ empty array ⇒ null (ANSI-safe) ⇒ LCP = m
    coalesce(try_element_at(firstDiff, lit(1)).cast("long") - 1L,
      m.cast("long"))
  }

  /** Per-document longest repeated substring, DIRECT variant: ranks the
    * full maxLen-bounded prefix in ONE ranking round (string range sort
    * — exactly the q87/q89 oracle contract) and computes SA-neighbor
    * LCPs by char comparison on the two bounded prefixes instead of the
    * level-ladder descent. For bounded maxLen ≤ ~64 this strictly
    * dominates the ladder: one range shuffle of ≤maxLen-char keys
    * replaces log₂(maxLen)+1 shuffles, and the LCP probe is a codegen'd
    * expression over one representative pair per adjacent rank. The
    * ladder ([[build]] + [[longestRepeatPerDoc]]) remains the scale path
    * when maxLen grows past what you'd ship as a sort key. */
  def longestRepeatPerDocDirect(docs: DataFrame, idCol: String,
                                textCol: String, maxLen: Int,
                                buckets: Int = 32): DataFrame = {
    val base = docs
      .where(length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, length($textCol)), " +
            s"i -> substring($textCol, i, $maxLen))")).as(Seq("pos0", "c")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("c"))
      // materialize the explode once — the range partitioner's sample
      // pass otherwise re-evaluates it (same move as build())
      .localCheckpoint()
    val ranked = denseRankBy(base, col("c"), buckets).localCheckpoint()
    val reps = ranked
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("rank")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("_rn") === 1)
      .select(col("rank"), col("c"))
    val lcp = reps.join(
        reps.select((col("rank") - 1).as("rank"), col("c").as("c2")),
        "rank")
      .select(col("rank"), commonPrefixLen(col("c"), col("c2")).as("lcp"))
    // bounded-suffix length IS length(c): substring truncates at doc end
    repeatReadout(
      ranked.withColumn("_slen", length(col("c")).cast("long")), lcp)
  }

  /** Shared readout: given ranks carrying `_slen` (bounded-suffix
    * length) and the adjacent-rank LCP table, produce per-doc longest
    * repeats — rank ties take the full bounded length, singletons take
    * the best SA-neighbor LCP. One rule, used by BOTH the ladder and
    * direct variants (their equivalence is spec-asserted). */
  private def repeatReadout(ranksWithSlen: DataFrame,
                            lcp: DataFrame): DataFrame = {
    val tied = ranksWithSlen.withColumn("_nt",
      count(lit(1)).over(Window.partitionBy(col("rank"))))
    val lcpSucc = lcp.select(col("rank"), col("lcp").as("_lcpS"))
    val lcpPred = lcp.select((col("rank") + 1).as("rank"),
      col("lcp").as("_lcpP"))
    tied
      .join(lcpSucc, Seq("rank"), "left")
      .join(lcpPred, Seq("rank"), "left")
      .withColumn("_rep",
        when(col("_nt") >= 2, col("_slen"))
          .otherwise(greatest(coalesce(col("_lcpS"), lit(0L)),
            coalesce(col("_lcpP"), lit(0L)))))
      .groupBy(col("doc_id"))
      .agg(max(col("_rep")).as("max_repeat_len"))
  }

  /** Per-doc longest repeated substring length (capped at maxLen):
    * for every position, the best match with any OTHER suffix is the
    * max of (a) full bounded-suffix length if another position shares
    * its rank, (b) LCP with the rank's SA neighbors (the SA property:
    * nearest-in-order maximizes LCP); then max over the doc. Documents
    * whose every substring is unique report 0. */
  def longestRepeatPerDoc(index: Index): DataFrame = {
    val ranks = index.ranks
    val lens = ranks.groupBy(col("doc_id")).agg(max(col("pos")).as("_len"))
    val withLen = ranks.join(lens, "doc_id")
      .withColumn("_slen",
        least(col("_len") - col("pos") + 1, lit(index.maxLen)).cast("long"))
    repeatReadout(withLen, adjacentLcp(index))
  }
}
