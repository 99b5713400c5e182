package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the ANALYZE-style stats feed (null
  * counts, NDV, min/max per column) a cost-based optimizer or
  * data-quality monitor reads. ONE scan: every column's stats land in
  * one aggregate row, then `stack` unpivots to a row per column.
  * Numeric and string min/max live in separate typed columns — a
  * single mixed column would hash on engine-specific number formatting.
  *
  * Two NDV regimes, same single-scan shape:
  *
  *  - `exact = true`: `count_distinct` per column. Spark plans multiple
  *    exact distincts as ONE Expand (row blowup × #distinct-columns) +
  *    two-level aggregate — the oracle-checkable twin, fine at test SF,
  *    wrong at 100 TB.
  *  - `exact = false`: `approx_count_distinct` (HyperLogLog++, `rsd`
  *    relative error). No Expand anywhere in the plan (PlanShapeSpec
  *    pins this): partial HLL buffers merge map-side, so the scan's
  *    row count never multiplies. This is the production profile.
  */
object ColumnProfile {

  /** numeric = true: min/max reported as double (`vmin_num`/`vmax_num`);
    * false: reported as string (`vmin_str`/`vmax_str`). */
  final case class ProfCol(name: String, numeric: Boolean)

  def profile(df: DataFrame, cols: Seq[ProfCol], exact: Boolean,
              rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(!_.name.contains("'")),
      "column names must not contain single quotes (interpolated into stack())")
    def ndv(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
    val aggs = cols.zipWithIndex.flatMap { case (pc, i) =>
      val c = col(pc.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nu_$i"),
        ndv(c).as(s"nd_$i")) ++
        (if (pc.numeric)
           Seq(min(c).cast("double").as(s"mn_$i"),
             max(c).cast("double").as(s"mx_$i"))
         else
           Seq(min(c).cast("string").as(s"mn_$i"),
             max(c).cast("string").as(s"mx_$i")))
    }
    val wide = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (pc, i) =>
      if (pc.numeric)
        s"'${pc.name}', nu_$i, nd_$i, mn_$i, mx_$i, CAST(NULL AS STRING), CAST(NULL AS STRING)"
      else
        s"'${pc.name}', nu_$i, nd_$i, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_$i, mx_$i"
    }
    wide.selectExpr("n",
      s"""stack(${cols.length},
         ${rows.mkString(",\n         ")})
         AS (col_name, n_nulls, n_distinct, vmin_num, vmax_num, vmin_str, vmax_str)""")
  }
}
