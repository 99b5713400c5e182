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
  /** Fixed-round k-core peel census: round r+1 deletes every node
    * whose degree in round r's graph is < k, together with its
    * incident edges; rows (round, n_nodes, n_edges) for rounds 0..R
    * (round 0 = the input graph, nodes counted as edge endpoints).
    * The census readout is R+1 rows regardless of graph size.
    *
    * Scale: each round is one degree aggregation plus two semi-joins
    * on the SHRINKING edge list — R small key-hashed shuffles, no
    * all-pairs work anywhere; the per-round frame is localCheckpoint'd
    * so lineage stays flat (the connectedComponents discipline). A
    * fixed R (rather than peel-to-fixpoint) keeps the result
    * deterministic AND SQL-replayable as unrolled CTEs; on power-law
    * similarity graphs the census converges in a handful of rounds,
    * and the monotone survivor counts tell the caller whether another
    * round is worth scheduling. */
  def kCoreCensus(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    var e = pairs.select(col("x"), col("y")).localCheckpoint()
    val census = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    def record(r: Int): Unit =
      census += ((r, degrees(e).count(), e.count()))
    record(0)
    for (r <- 1 to rounds) {
      val keep = degrees(e).filter(col("degree") >= k).select(col("v"))
      e = e
        .join(keep.select(col("v").as("x")), Seq("x"), "left_semi")
        .join(keep.select(col("v").as("y")), Seq("y"), "left_semi")
        .localCheckpoint()
      record(r)
    }
    census.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** Fixed-round synchronous LABEL PROPAGATION over oriented (x < y)
    * distinct edges: label₀(v) = v; each round every node adopts the
    * most frequent label among its NEIGHBORS, ties broken by lowest
    * label — fully deterministic, so the result is SQL-replayable as
    * unrolled CTEs. Returns (v, label) after `rounds` rounds.
    *
    * This is the community detector that connected components is NOT:
    * CC (min-label to fixpoint) merges everything reachable, while
    * frequency-argmax propagation lets densely-connected groups keep
    * distinct labels across weak bridges — the readout that splits a
    * template FAMILY from two families sharing one chance collision.
    *
    * Scale: each round is one equi-join of the (2·|E|)-row adjacency
    * against the |V|-row label map, a (v, label) count, and a
    * per-node argmax window — all keyed shuffles, no all-pairs work;
    * per-round frames are localCheckpoint'd so lineage stays flat
    * (the kCoreCensus discipline). Fixed `rounds` (not to-fixpoint)
    * keeps it deterministic and bounded; synchronous LPA can
    * oscillate on bipartite structures, which a census over two
    * consecutive rounds exposes if it matters. */
  def labelPropagation(pairs: DataFrame, rounds: Int): DataFrame = {
    val adj = pairs.select(col("x").as("v"), col("y").as("u"))
      .union(pairs.select(col("y").as("v"), col("x").as("u")))
      .localCheckpoint()
    var labels = adj.select(col("v")).distinct()
      .withColumn("label", col("v"))
    for (_ <- 1 to rounds) {
      val cnt = adj
        .join(labels.select(col("v").as("u"), col("label")), Seq("u"))
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("v"))
        .orderBy(col("c").desc, col("label").asc)
      labels = cnt.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("v"), col("label"))
        .localCheckpoint()
    }
    labels
  }

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
