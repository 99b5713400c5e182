package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in scaled INTEGER arithmetic — graph
  * centrality over an edge list (link graphs, citation graphs, the
  * doc-reference graph a curation pipeline builds for spam/authority
  * scoring). Complements the connected-components operator
  * (Dedup.connectedComponents): CC answers "which docs are the same",
  * PageRank answers "which nodes matter".
  *
  * Why integers: a float PageRank's per-node sums depend on partition
  * accumulation order, so two engines (or two partitionings) disagree
  * in the low bits and a hash comparison fails. Here ranks live at a
  * fixed scale (default 10^12), contributions are `rank div outdeg`
  * (floor), and the damping step is `(dampingPct · Σcontrib) div 100` —
  * every operation is exact and associative, so the result is
  * bit-identical for ANY partitioning and any engine (q72's DuckDB
  * oracle unrolls the same iterations). The floor divisions lose at
  * most outdeg ulps per node per iteration — ~10^-10 relative at the
  * default scale, far below any ranking decision.
  *
  * Scale shape: per iteration one shuffle join (ranks ⋈ edges on src —
  * both sides partition by the same key, so the edge side's shuffle is
  * reusable across iterations) and one aggregation on dst with
  * map-side partial sums. Iteration count is FIXED (the usual 10-20
  * rounds), so lineage stays bounded without checkpointing; for long
  * runs, `localCheckpoint` the ranks frame every ~10 rounds like the
  * CC loop does. Dangling nodes (no out-edges) contribute nothing and
  * total rank mass decays — the classic simplification; both sides of
  * the oracle compute the identical quantity.
  */
object PageRank {

  /** Ranks after `iterations` rounds: (n BIGINT, rank BIGINT). Node ids
    * must be non-negative (floor division = truncation only then);
    * callers with string keys hash them to longs first.
    * Overflow bound: total rank mass never grows (each round redistributes
    * then damps it), so every rank and every per-node contribution sum is
    * ≤ n·scale, and the safe condition is n · scale < 2^63 (9.2e18) —
    * ~9·10^6 nodes at the default scale, independent of degree
    * distribution (a hub chain can concentrate up to ~n·scale of mass on
    * one node, so a per-edge in-degree bound alone is NOT sufficient).
    * Lower `scale` for larger graphs; rank resolution degrades gracefully
    * (ranks are integers in units of scale⁻¹). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, scale: Long = 1000000000000L,
          dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val (e, nodes) = Graphs.normalize(edges, srcCol, dstCol)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // one co-partitioned frame (src, dst, d); every iteration joins it
    // by src, so its shuffle output is reused round to round
    val withDeg = e.join(outdeg, "src")
    val base = scale / 100 * (100 - dampingPct)
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iterations) {
      val contribs = withDeg.join(ranks, col("src") === col("n"))
        .select(col("dst").as("n"), expr("r div d").as("c"))
        .groupBy(col("n")).agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("n"), "left")
        .select(col("n"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(c, cast(0 as bigint))) div 100"))
            .as("r"))
    }
    ranks.select(col("n"), col("r").as("rank"))
  }
}
