package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff — classify every key across two table
  * snapshots as added / removed / changed / unchanged. The engine-side
  * mechanic is the scalable one: each side reduces to (key, 16-byte row
  * hash) BEFORE the full-outer join, so the shuffle carries two narrow
  * columns instead of every compared column, and "changed" is one hash
  * comparison instead of N column comparisons (md5 collisions are
  * 2^-128 — the standard CDC trade). Equality semantics are null-safe:
  * each column is coalesced to a sentinel under a non-printable
  * separator, so NULL vs 'x' and shifted column boundaries both change
  * the hash.
  *
  * 100 TB posture: one shuffle per side on the key (co-partitioned by
  * the join), hash computed in the scan stage's codegen span. For
  * bucketed/partitioned snapshot storage the exchange disappears
  * entirely — the plan is exactly the sort-merge-join shape AQE handles.
  */
object SnapshotDiff {

  /** Null-safe row fingerprint over `cols` (16-byte md5). */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** One row per key present in either snapshot, with a `status` column:
    * added (curr only), removed (prev only), changed (both, differing
    * hash), unchanged. */
  def diff(prev: DataFrame, curr: DataFrame,
           keys: Seq[String], compare: Seq[String]): DataFrame = {
    val p = prev.select(
      keys.map(col) :+ rowHash(compare.map(col)).as("_ph"): _*)
    val c = curr.select(
      keys.map(col) :+ rowHash(compare.map(col)).as("_ch"): _*)
    p.join(c, keys, "full_outer")
      .withColumn("status",
        when(col("_ph").isNull, "added")
          .when(col("_ch").isNull, "removed")
          .when(col("_ph") =!= col("_ch"), "changed")
          .otherwise("unchanged"))
      .drop("_ph", "_ch")
  }
}
