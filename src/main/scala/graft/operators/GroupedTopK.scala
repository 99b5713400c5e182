package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Grouped top-k WITHOUT a window — the scale answer to the
  * "row_number over (partition by g order by s) <= k" pattern, whose
  * physical plan fully sorts every partition group in one task (fine
  * when groups are vocabulary-sized, a hazard when one group holds a
  * corpus; see SCALE.md on q39/q59).
  *
  * This is a typed Aggregator holding a k-bounded ordered list, so:
  *  - partial aggregation keeps ≤ k rows per (partition, group) before
  *    the exchange — the shuffle carries k·|groups| rows, not the data;
  *  - no per-group global sort ever materializes;
  *  - ordering (score desc, key asc) is total, so the result is
  *    deterministic under any partitioning/merge tree — which is what
  *    lets q66 share q59's DuckDB oracle verbatim.
  */
object GroupedTopK {

  /** One scored candidate: ordering key (score desc, key asc) plus two
    * payload longs riding along (q66 carries tf/df). */
  final case class Scored(score: Double, key: String, a: Long, b: Long)

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.key))

  final class TopKAgg(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], s: Scored): Seq[Scored] =
      if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, s)) b
      else (s +: b).sorted(ord).take(k)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Aggregate column: k-bounded array<struct<score,key,a,b>> ordered
    * (score desc, key asc). Use inside groupBy(...).agg(...). */
  def topK(k: Int)(score: Column, key: Column, a: Column, b: Column): Column =
    udaf(new TopKAgg(k)).apply(score, key, a, b)
}
