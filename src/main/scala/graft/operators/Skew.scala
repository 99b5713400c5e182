package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted two-stage aggregation.
  *
  * At 100 TB a heavy-hitter group key (one country, one error status)
  * lands its entire partition on a single reducer. Salting splits each
  * key into `salts` sub-keys for the first (partial) aggregation, then
  * re-aggregates the tiny salted partials — the classic two-stage
  * pattern. Results are identical to a plain groupBy (the oracle checks
  * exactly that); only the shuffle distribution changes. AQE's skew-join
  * handling covers joins; this covers aggregations.
  *
  * Only aggregates that compose associatively over partials are exposed
  * (count → sum of counts, sum → sum of sums, min/max → min/max).
  */
object Skew {

  /** count + decimal-sum per key, salted `salts` ways on `saltBy` (any
    * well-distributed column; pick a high-cardinality one). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltBy: String, salts: Int,
                     decType: String = "decimal(18,2)"): DataFrame = {
    val salted = df.withColumn("_salt", pmod(col(saltBy), lit(salts)))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(col(valueCol).cast(decType)).as("_s"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("sum_value"))
  }

  /** Salted equi-join for skewed KEYS — the join-side counterpart of
    * [[saltedCountSum]], for when the small side is too large to
    * broadcast and a hot key would funnel one reducer: the large side
    * gets a deterministic salt from `saltBy` (xxhash64 — engine-internal
    * only, the salt never surfaces in results), the small side is
    * replicated `salts` ways, and the join key becomes (key, salt) so a
    * hot key spreads over `salts` reducers. Row-identical to
    * `large.join(small, key)` (the oracle checks exactly that); the
    * trade is `salts`× shuffle volume OF THE SMALL SIDE only. AQE's
    * skew-join split covers sort-merge joins adaptively; this is the
    * explicit form for when you know the hot keys up front. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: String, salts: Int): DataFrame = {
    val lw = large.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(salts.toLong)).cast("int"))
    val sw = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    lw.join(sw, Seq(key, "_salt")).drop("_salt")
  }
}
