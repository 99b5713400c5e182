package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory answer to "top tokens over 100 TB" when the exact
  * groupBy (q57) would shuffle a vocabulary that no longer fits a
  * reducer. The summary holds ≤ `capacity` counters; the classic
  * guarantees (Misra & Gries '82; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12) are:
  *
  *  - every item with true count > n/(capacity+1) IS in the summary;
  *  - estimates never overcount: true − n/(capacity+1) ≤ est ≤ true;
  *  - when `capacity` ≥ distinct items the sketch is EXACT (no counter
  *    ever evicts) — which is what lets q65 carry a DuckDB oracle.
  *
  * Plan shape: partial sketches build map-side per partition (Spark
  * keeps typed-Aggregator buffers as live objects within a partition —
  * no per-row serialization), and only `capacity`-bounded maps cross
  * the exchange; the merge subtracts the (capacity+1)-th largest count
  * when the union overflows, which is what preserves the error bound
  * under any merge tree — and therefore under any partitioning. */
object HeavyHitters {

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      if (tok == null) b
      else b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1L)
        case None if b.size < capacity => b.updated(tok, 1L)
        case None =>
          // decrement-all step: drop zeros, the arriving token is "spent"
          b.flatMap { case (k, v) =>
            if (v > 1L) Some(k -> (v - 1L)) else None
          }
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count, keep positives
        val t = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.flatMap { case (k, v) =>
          if (v - t > 0L) Some(k -> (v - t)) else None
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
  }

  /** Aggregate column: map<item, estimated count> with ≤ capacity keys. */
  def sketch(item: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity)).apply(item)
}
