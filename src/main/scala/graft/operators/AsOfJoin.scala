package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, the latest
  * right row with the same key and rightTime <= leftTime.
  *
  * Spark has no native ASOF JOIN; the classic scalable composition is
  * used here — union both sides tagged, one window per key ordered by
  * (time, side-tag), carry the last-seen right payload forward, keep
  * left rows. Cost: one shuffle of (|L|+|R|) on the key — no range
  * explosion, no per-row search, skew handled by AQE. For broadcast-able
  * right sides a BroadcastNestedLoopJoin + max-window would also work;
  * this shape survives both sides being large.
  *
  * At equal timestamps the right row is visible to the left row
  * (inclusive >=). Right-side ties on (key, time) must be resolved
  * before the join (e.g. keep max payload id) — carried columns are
  * taken per-column and would otherwise mix rows.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      lookup side (deduped per (key, time))
    * @param key        join key column name (same name both sides)
    * @param leftTime   left ordering column (name)
    * @param rightTime  right ordering column (name)
    * @param payload    right columns to carry onto left rows
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag=1 rows are right; at equal time they sort BEFORE tag=0 left
    // rows (desc) so inclusive >= holds
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(0))
      .select((leftCols.map(col) :+ col("_t") :+ col("_tag")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_tag", lit(1))
      .select((leftCols.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("_t") :+ col("_tag")) ++ payload.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((leftCols.map(col) :+ col("_tag")) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("_tag") === 0).drop("_tag")
  }
}
