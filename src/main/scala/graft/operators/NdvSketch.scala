package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch — LINEAR COUNTING (Whang et al.
  * 1990): hash each item to one of m bit positions, count occupied
  * bits, estimate n̂ = −m·ln(1 − occupied/m). The cardinality member
  * of the sketch family (Misra–Gries for heavy hitters, t-digest for
  * quantiles, Bloom for membership): m bits of state per group, ORs
  * merge losslessly, so partial aggregation, stream micro-batches, and
  * cross-partition rollups all compose exactly like the others.
  *
  * Why not Spark's approx_count_distinct: its HLL++ registers are
  * engine-internal — fine in production, impossible to oracle-check.
  * Here the POSITION is computed in plain column space (an md5 hex
  * slice, [[position]]) before the Aggregator sees it, so DuckDB
  * derives the identical positions and `COUNT(DISTINCT position)`
  * equals the bitmap's popcount EXACTLY — collisions and all (q84).
  * The log-estimate is float and stays OUT of oracle outputs; its
  * accuracy (±few % below half load) is pinned by NdvSketchSpec.
  *
  * Choose m ≳ 10·NDV for <2% bias (classic guidance); at m bits the
  * buffer is m/8 bytes — 2^20 positions = 128 KiB per group crossing
  * the exchange, constant in data size. */
object NdvSketch {

  /** Bit position for any column: first 8 md5 hex chars as a 32-bit
    * int, masked to [0, 2^log2m). Pure column arithmetic — the same
    * expression is DuckDB-spellable (q84's oracle).
    *
    * NULL CONTRACT: position(NULL) is NULL, and the primitive-Long
    * Aggregator input would decode that NULL as 0 — a phantom bit 0
    * that SQL's null-ignoring COUNT(DISTINCT …) does not count.
    * Callers must filter nulls out BEFORE [[sketch]] (q84 does). */
  def position(c: Column, log2m: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit((1L << log2m) - 1))

  /** Typed Aggregator over precomputed positions: OR-mergeable bitmap
    * of m bits packed in m/64 longs. */
  final class LinearCounting(log2m: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(log2m >= 6 && log2m <= 26, "need 64 <= m <= 64Mi bits")
    private val words = 1 << (log2m - 6)
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], pos: Long): Array[Long] = {
      b((pos >>> 6).toInt) |= (1L << (pos & 63)); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Aggregate column: the packed bitmap (array<bigint>, m/64 words). */
  def sketch(pos: Column, log2m: Int): Column =
    udaf(new LinearCounting(log2m)).apply(pos)

  /** Occupied-bit count of a packed bitmap — exact popcount, the
    * oracle-checkable leg. */
  def occupied(bitmap: Seq[Long]): Long =
    bitmap.iterator.map(java.lang.Long.bitCount(_).toLong).sum

  /** Linear-counting estimate n̂ = −m·ln(V/m), V = vacant bits.
    * Saturated bitmaps (V = 0) return m·ln(m) as the conventional
    * upper sentinel. Float — never put this in an oracle output. */
  def estimate(bitmap: Seq[Long], log2m: Int): Double = {
    val m = (1L << log2m).toDouble
    val v = m - occupied(bitmap)
    if (v <= 0) m * math.log(m) else -m * math.log(v / m)
  }
}
