package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS shortest paths over an edge list — bounded-round
  * distance propagation (the "how far is every node from the seed
  * set" primitive: blast-radius queries over dependency graphs,
  * crawl-depth labeling, seed-expansion for curation). Third member
  * of the graph family: components (Dedup.connectedComponents) answer
  * "which nodes are together", PageRank answers "which matter", BFS
  * answers "how far".
  *
  * All-integer (distances are hop counts; `inf` is a sentinel), so
  * results are bit-identical under any partitioning and any engine —
  * q83's oracle unrolls the same relaxation rounds. Per round: one
  * join of the frontier-bearing distance table with edges on src
  * (shuffle reusable across rounds, as in PageRank) + a min-combine
  * aggregation on dst. `rounds` bounds the radius explicitly — the
  * caller picks the diameter bound, and lineage stays bounded without
  * checkpointing. Unreached nodes keep `inf`.
  *
  * `inf` must exceed every reachable distance: real distances reach at
  * most `rounds`, so `rounds < inf` is required — otherwise a node at
  * exactly `inf` hops would alias the unreached sentinel and relaxation
  * would silently propagate inf+1 values as if they were distances. */
object Bfs {

  def distances(edges: DataFrame, srcCol: String, dstCol: String,
                sources: Seq[Long], rounds: Int,
                inf: Long = 9999L): DataFrame = {
    require(sources.nonEmpty && rounds >= 0)
    require(rounds < inf,
      s"inf sentinel ($inf) must exceed the max achievable distance ($rounds)")
    val (e, nodes) = Graphs.normalize(edges, srcCol, dstCol)
    var dist = nodes.withColumn("d",
      when(col("n").isin(sources: _*), 0L).otherwise(lit(inf)))
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist, col("n") === col("src"))
        .select(col("dst").as("n"), (col("d") + 1L).as("nd"))
        .groupBy(col("n")).agg(min(col("nd")).as("nd"))
      dist = dist.join(relaxed, Seq("n"), "left")
        .select(col("n"),
          least(col("d"), coalesce(col("nd"), lit(inf))).as("d"))
    }
    dist
  }
}
