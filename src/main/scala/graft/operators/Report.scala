package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's daily-report aggregation suite
  * (`/root/reference/lib/maillogsentinel/report.py:109-193`): one shared scan
  * feeding five top-k hash aggregations, two scalar counters, and an error
  * breakdown. In Spark each is a partial+final hash aggregate; the shared
  * scan is recovered by caching the filtered frame once (report-shaped
  * callers) or by running them as independent queries (oracle harness).
  *
  * Top-k = groupBy(keys).count.orderBy(count desc, keys asc).limit(k) —
  * Catalyst plans TakeOrderedAndProject: per-partition bounded heaps, only k
  * rows per partition reach the driver, no global sort. The ascending key
  * tiebreaker replaces the reference's Python-stable-sort file order
  * (report.py:176-190) with a deterministic total order (SURVEY §7.4.2).
  */
object Report {

  /** Count per key combination, deterministic top-k. */
  def topK(df: DataFrame, keys: Seq[String], k: Int,
           countName: String = "n"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countName))
      .orderBy(col(countName).desc +: keys.map(col(_).asc): _*)
      .limit(k)

  /** Conditional count column: rows where `cond` holds
    * (ref: total_rev_dns_failures, report.py:166-167). */
  def countWhere(cond: Column, name: String): Column =
    count(when(cond, 1)).as(name)

  /** Full descending breakdown, no limit (ref: rev_dns_error_counts,
    * report.py:168-170,191-193). */
  def breakdown(df: DataFrame, key: String, countName: String = "n"): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as(countName))
      .orderBy(col(countName).desc, col(key).asc)
}
