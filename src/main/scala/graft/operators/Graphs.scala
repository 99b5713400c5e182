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
}
