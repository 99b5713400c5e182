package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (theta) join of a large probe table against a small dimension of
  * non-overlapping [lo, hi] intervals — the Spark-native shape of the
  * reference's sorted-table binary search for GeoIP/ASN enrichment
  * (`/root/reference/bin/ipinfo.py:207,217-238,309-339`).
  *
  * Two physical strategies, both shuffle-free on the probe side:
  *
  *  - [[broadcastTheta]]: `probe LEFT JOIN broadcast(dim) ON key BETWEEN lo
  *    AND hi`. Catalyst plans BroadcastNestedLoopJoin — O(|dim|) per probe
  *    row. Fine for dims of a few thousand rows; degrades at the ~300k-row
  *    real GeoIP scale.
  *
  *  - [[bucketed]]: the 100-TB path. Each dim interval is exploded into the
  *    fixed-width buckets it covers (`lo >> shift .. hi >> shift`), the probe
  *    computes its bucket (`key >> shift`), and the join becomes a broadcast
  *    *equi*-join on the bucket plus a residual range filter — O(1) expected
  *    probes per row, still zero shuffles of the probe table. `shift` trades
  *    dim blow-up against per-bucket fan-out; for IPv4 /16 buckets
  *    (shift=16) the real-world GeoIP table explodes ~2-3x.
  */
object RangeJoin {

  /** Plain broadcast non-equi left join (BroadcastNestedLoopJoin). */
  def broadcastTheta(
      probe: DataFrame, dim: DataFrame,
      key: Column, lo: Column, hi: Column): DataFrame =
    probe.join(broadcast(dim), key >= lo && key <= hi, "left")

  /** Bucketed broadcast equi-join; requires integral key/lo/hi. */
  def bucketed(
      probe: DataFrame, dim: DataFrame,
      keyCol: String, loCol: String, hiCol: String,
      shift: Int): DataFrame = {
    val width = 1L << shift
    val exploded = dim.withColumn(
      "_bucket",
      explode(sequence(
        (col(loCol) / width).cast("long"),
        (col(hiCol) / width).cast("long"))))
    val p = probe.withColumn("_bucket", (col(keyCol) / width).cast("long"))
    p.join(
        broadcast(exploded),
        p("_bucket") === exploded("_bucket") &&
          col(keyCol) >= col(loCol) && col(keyCol) <= col(hiCol),
        "left")
      .drop("_bucket")
  }
}
