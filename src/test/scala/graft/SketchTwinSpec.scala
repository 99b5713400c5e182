package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q35 exact-twin contract: the production sketch summary
  * ([[QueriesMore.sketchApprox]] — HLL NDV + percentile_approx) must
  * track the oracled exact variant within its published error bounds.
  * The plan shape (no Expand, no Window, one scan) is pinned separately
  * in PlanShapeSpec; this suite bounds the VALUES.
  */
class SketchTwinSpec extends SparkSpec {

  test("sketch summary tracks the exact twin within error bounds") {
    val exact = QueriesMore.sketchSummary(spark, sf(), exact = true)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val approx = QueriesMore.sketchSummary(spark, sf(), exact = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(exact.keySet == approx.keySet, "per-type row sets must agree")
    assert(exact.nonEmpty)

    // exact quartile band per type for the median check: percentile
    // _approx returns an actual data point near the median, so it must
    // land within [p25, p75] of the same ordering the exact kernel uses
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ranked = Tables.events(spark, sf())
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val band = ranked
      .filter(col("rn") === floor((col("cnt") + 3) / 4).cast("int") ||
        col("rn") === floor((col("cnt") * 3 + 3) / 4).cast("int"))
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("p25"), max(col("value")).as("p75"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

    exact.foreach { case (tpe, (users, _)) =>
      val (approxUsers, approxMed) = approx(tpe)
      // HLL at rsd = 2%: 10% relative slack is > 5 sigma
      assert(math.abs(approxUsers - users) <= math.max(1L, users / 10),
        s"$tpe: HLL users $approxUsers vs exact $users")
      val (p25, p75) = band(tpe)
      assert(approxMed >= p25 && approxMed <= p75,
        s"$tpe: approx median $approxMed outside exact [$p25, $p75]")
    }
  }
}
