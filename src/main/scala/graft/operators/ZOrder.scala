package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column file-skipping
  * lever at 100 TB. Sorting a corpus by one column gives perfect
  * min/max pruning on that column and none on any other; interleaving
  * the bits of several columns into one sort key gives useful pruning
  * on ALL of them (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea; Morton
  * 1966). Reference analog: none — MailLogSentinel appends CSV in
  * arrival order (maillogsentinel.py) and every ad-hoc grep scans the
  * whole file; this is the beyond-reference layout operator for the
  * corpus-curation write path (CorpusSink).
  *
  * The key is built from plain shift/mask column expressions, so it
  * stays inside whole-stage codegen and constant-folds per row — no
  * UDF. Writing is `repartitionByRange(zkey).sortWithinPartitions`:
  * one range shuffle, each output file covers a compact Z-curve
  * segment, and file-level min/max stats on the ORIGINAL columns
  * become tight (ZOrderSpec measures per-file spread via
  * `input_file_name()`: ≥2× tighter per column and ≥5× tighter as a
  * min/max area — the quantity that drives multi-predicate file
  * skipping; the per-column ideal for 16 files × 2×8-bit keys is ~4×,
  * shaved because sampled range boundaries straddle Z-quadrants).
  *
  * Bucketization: real columns are first rank-bucketed to `bits`-bit
  * ints. [[bucketBoundaries]]/[[bucketize]] use sampled quantile
  * boundaries (`approxQuantile`, the two-pass sample Delta uses) so
  * skew cannot starve bit positions; already-integer columns in a
  * known range can interleave directly after clamping.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (MSB-first across
    * columns at each bit position, col 0 highest). Columns must already
    * be non-negative ints < 2^bits; totalBits = cols·bits must be ≤ 62.
    */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && cols.length * bits <= 62,
      "need 1+ cols and cols*bits <= 62")
    val n = cols.length
    // bit i of column c lands at output position i*n + (n-1-c)
    val parts = for {
      i <- 0 until bits
      c <- 0 until n
    } yield shiftleft(
      shiftright(cols(c).cast("long"), i).bitwiseAND(lit(1L)),
      i * n + (n - 1 - c))
    parts.reduce(_.bitwiseOR(_))
  }

  /** Sampled per-column bucket boundaries: 2^bits − 1 interior quantile
    * cut points (one tiny driver-side array per column — the broadcast
    * side of the layout job, never a shuffle of the data). */
  def bucketBoundaries(df: DataFrame, column: String, bits: Int,
                       relErr: Double = 0.001): Array[Double] = {
    val k = (1 << bits) - 1
    val probs = (1 to k).map(_.toDouble / (1 << bits)).toArray
    df.stat.approxQuantile(column, probs, relErr)
  }

  /** Map a numeric column to its bucket id (0 .. 2^bits−1) given the
    * boundaries — a fold of `when` comparisons, codegen-friendly for
    * the handful of bits a Z-key uses. Folded in REVERSE so the
    * smallest boundary ends up as the outermost `when`: nested `when`s
    * short-circuit outermost-first, and every value below b0 also
    * satisfies `c <= b6`. */
  def bucketize(c: Column, boundaries: Array[Double]): Column =
    boundaries.zipWithIndex.reverse.foldLeft(lit(boundaries.length): Column) {
      case (acc, (b, i)) => when(c <= b, lit(i)).otherwise(acc)
    }.cast("long")

  /** Z-order a frame by the given integer-valued columns and write it:
    * one range shuffle into `numFiles` Z-contiguous parquet files. */
  def writeZOrdered(df: DataFrame, intCols: Seq[String], bits: Int,
                    numFiles: Int, path: String): Unit = {
    val keyed = df.withColumn("_zkey",
      zkey(intCols.map(col), bits))
    keyed
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
