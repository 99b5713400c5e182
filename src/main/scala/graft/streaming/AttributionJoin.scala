package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM join — attribution ("which click follows
  * which view, per user, within the window") as Spark's native
  * stream-stream inner join. This is the §2.8 tier above stream-static
  * enrichment: BOTH sides are unbounded, so the engine must buffer
  * each side's rows as state and the time-interval join condition plus
  * the two watermarks are what let it EVICT: a view older than
  * (click watermark − window) can never match a future click, so its
  * state is dropped — without the interval bound the state grows
  * forever. Late rows beyond the watermark are dropped by contract,
  * not silently joined (AttributionJoinSpec pins both behaviors).
  *
  * Output is append-mode (a matched pair is final — inner join rows
  * can never be retracted), so idempotent file sinks compose as usual.
  */
object AttributionJoin {

  /** Inner-join `views`(user, ms) × `clicks`(user, ms): pairs where
    * the click lands in (view, view + windowMs]. `delayMs` is both
    * sides' watermark delay — the allowed out-of-orderness. */
  def run(views: DataFrame, clicks: DataFrame,
          windowMs: Long, delayMs: Long): DataFrame = {
    // milliseconds verbatim — dividing down to whole seconds would
    // silently narrow the promised out-of-orderness (delayMs=500 must
    // tolerate 500 ms, not 0)
    val delay = s"$delayMs milliseconds"
    val v = views
      .select(col("user").as("v_user"),
        timestamp_millis(col("ms")).as("v_ts"))
      .withWatermark("v_ts", delay)
    val c = clicks
      .select(col("user").as("c_user"),
        timestamp_millis(col("ms")).as("c_ts"))
      .withWatermark("c_ts", delay)
    v.join(c,
        col("v_user") === col("c_user") &&
          col("c_ts") > col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr(s"interval ${windowMs} milliseconds"))
      .select(col("v_user").as("user"),
        unix_millis(col("v_ts")).as("view_ms"),
        unix_millis(col("c_ts")).as("click_ms"))
  }
}
