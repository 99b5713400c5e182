package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Today's top-10 offenders" — the reference's headline report block
    * (report.py:311-341 analog). */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q03_topk_offenders")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * PERMANENTLY rows-only (BY DESIGN, not an oversight — do not
    * re-litigate per round): q35_approx_sketches. Its HLL / approx
    * -median estimates are engine-specific; no exact SQL twin exists,
    * so the driver records the weaker rows>0 check and correct_pct
    * tops out at registered−1. Every other registered query carries
    * oracle SQL. */
  def oracleSql: Map[String, String] = Queries.oracle
}
