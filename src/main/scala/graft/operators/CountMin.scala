package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the
  * point-frequency member of the sketch family (Misra–Gries answers
  * "which keys are heavy", CMS answers "how often is THIS key",
  * linear counting answers "how many distinct", t-digest "which
  * quantile"). d hash rows × w counters; update adds 1 to one counter
  * per row, estimate is the min over rows — never an underestimate,
  * overestimates by at most εN (ε = e/w) with probability ≥ 1 − e^−d.
  *
  * Representation is RELATIONAL, not a blob: the sketch is a
  * (j, pos, cnt) table of at most d·w rows. That buys three things at
  * 100 TB: partial aggregation collapses each partition's updates to
  * ≤ d·w rows before the shuffle (the only traffic is sketch-sized,
  * never corpus-sized); merging sketches is `union → sum` (exactly how
  * sketch tables from different days/streams compose); and the hash
  * POSITIONS are plain column md5 arithmetic ([[NdvSketch.position]]
  * precedent), so an external engine derives identical cells and the
  * whole estimate is oracle-checkable (q105) — a blob sketch can only
  * ever be spec-checked. */
object CountMin {

  /** Cell column of item `c` in hash row `j`: first 8 md5 hex chars of
    * the row-salted item, masked to [0, 2^log2w). */
  def position(c: Column, j: Int, log2w: Int): Column =
    conv(substring(md5(concat(lit(s"cm$j:"), c.cast("string"))), 1, 8),
        16, 10)
      .cast("long").bitwiseAND(lit((1L << log2w) - 1))

  /** All d cells of an item as one exploded (j, pos) pair stream —
    * a single narrow pass over the input (no d-fold rescan). */
  private def cells(df: DataFrame, item: Column, d: Int,
                    log2w: Int): DataFrame =
    df.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), position(item, j, log2w).as("pos"))): _*))
        .as("c"))
      .select(col("c.j"), col("c.pos"))

  /** Build the sketch table (j, pos, cnt), ≤ d·w rows. */
  def build(df: DataFrame, item: Column, d: Int, log2w: Int): DataFrame =
    cells(df, item, d, log2w)
      .groupBy(col("j"), col("pos")).agg(count(lit(1)).as("cnt"))

  /** Merge sketch tables built with the SAME (d, log2w): counters add. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a probe frame: min over the d probed cells.
    * `probes` must carry a unique `item` column; emits (item, est).
    * Cells the sketch never touched count 0 (left join + coalesce) —
    * an item absent from the stream estimates 0 unless every one of
    * its d cells collided. */
  def estimate(sketch: DataFrame, probes: DataFrame, item: Column,
               d: Int, log2w: Int): DataFrame =
    probes.select(item.as("item"))
      .select(col("item"), explode(array((0 until d).map(j =>
          struct(lit(j).as("j"), position(col("item"), j, log2w).as("pos"))): _*))
        .as("c"))
      .select(col("item"), col("c.j"), col("c.pos"))
      .join(sketch, Seq("j", "pos"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
