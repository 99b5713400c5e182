package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared edge-list hygiene for the graph operators ([[PageRank]],
  * [[Bfs]]): one definition of "the graph" so the family cannot
  * silently diverge on normalization rules. */
object Graphs {

  /** (edges, nodes): long ids, self-loops removed, duplicate edges
    * collapsed; nodes = src ∪ dst distinct. */
  def normalize(edges: DataFrame, srcCol: String,
                dstCol: String): (DataFrame, DataFrame) = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n"))).distinct()
    (e, nodes)
  }

  /** Undirected per-node degree from an oriented (x < y) distinct edge
    * list. */
  def degrees(pairs: DataFrame): DataFrame =
    pairs.select(col("x").as("v"))
      .union(pairs.select(col("y").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))

  /** Triangle + triplet census of an undirected graph given as
    * oriented (x < y) DISTINCT edges: one row
    * (n_nodes, n_edges, n_triangles, n_triplets, global_cc_ppm) where
    * global_cc = 3·triangles / triplets (integer ppm; 0 when the graph
    * has no triplets) and triplets = Σ_v C(deg_v, 2).
    *
    * The triangle join is the standard oriented two-hop join — each
    * triangle {a<b<c} counted exactly once via e(a,b)⋈e(b,c)⋈e(a,c).
    * Cost is Σ_v deg_v² on the join key, so callers must bound the
    * degree at EDGE-BUILD time (the rare-gram cap in q144 does: a
    * gram shared by ≤ maxDf docs emits ≤ C(maxDf,2) edges, and no
    * node's degree can exceed grams·maxDf). At 100 TB the further
    * refinement is degree-ordered orientation (low-degree endpoint
    * first), which this census inherits for free if the caller
    * orients by degree instead of id. */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val e1 = pairs.select(col("x").as("a"), col("y").as("b"))
    val e2 = pairs.select(col("x").as("b"), col("y").as("c"))
    val e3 = pairs.select(col("x").as("a"), col("y").as("c"))
    val tri = e1.join(e2, Seq("b")).join(e3, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = degrees(pairs)
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(expr("degree * (degree - 1) div 2")), lit(0L))
          .as("n_triplets"))
    val ne = pairs.agg(count(lit(1)).as("n_edges"))
    deg.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_triplets"),
        when(col("n_triplets") === 0, 0L)
          .otherwise(expr("n_triangles * 3000000 div n_triplets"))
          .as("global_cc_ppm"))
  }
}
