package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strict sequential funnel — "users who did A, then B after that,
  * then C after that" over an event stream (the conversion question
  * every product-analytics store answers; here it doubles as a
  * pipeline-stage progression probe over processing logs). Semantics:
  * step k's time is the EARLIEST event of step k's type strictly after
  * the user's step-(k−1) time; a user is "in" step k iff such an event
  * exists. Earliest-after is the standard greedy funnel and is optimal:
  * taking the earliest feasible step-k time can only widen the choice
  * for step k+1, so greedy finds a strictly-increasing assignment
  * whenever one exists.
  *
  * Shape: one shuffle per step (groupBy user over the step-filtered
  * slice joined to the previous frontier). The filter on event type
  * happens BEFORE each shuffle — only the step's own events move — and
  * the frontier frame is one row per qualifying user. Steps are a
  * handful; at 100 TB this is k narrow scans of a type-partitioned
  * table, not a per-user sort of everything.
  */
object Funnel {

  /** Per-user step times: (user, t1..tk BIGINT nullable) — tk null if
    * the user never completed step k. `tsCol` must be integral
    * (epoch ms); `steps` are values of `typeCol` in funnel order;
    * `maxGapMs` bounds each step-to-step gap (conversion windows —
    * without it, dense histories complete every funnel eventually).
    * NOTE with a gap the greedy is the standard windowed-funnel
    * semantic (each window anchors at the previous step's EARLIEST
    * feasible time), not a search over all anchor choices. */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String],
                maxGapMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty)
    val slim = events.select(col(userCol).as("u"),
      col(typeCol).as("et"), col(tsCol).cast("long").as("ms"))
    var acc = slim.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("ms")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val k = i + 1
      val inWindow = maxGapMs.fold(lit(true))(g =>
        col("ms") <= col(s"t$i") + lit(g))
      val next = slim.filter(col("et") === step)
        .join(acc.select(col("u"), col(s"t$i")), "u")
        .filter(col("ms") > col(s"t$i") && inWindow)
        .groupBy(col("u")).agg(min(col("ms")).as(s"t$k"))
      acc = acc.join(next, Seq("u"), "left")
    }
    acc
  }

  /** Step counts: one row, n1 ≥ n2 ≥ … ≥ nk. */
  def counts(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxGapMs: Option[Long] = None): DataFrame = {
    val times = stepTimes(events, userCol, typeCol, tsCol, steps, maxGapMs)
    times.agg(
      count(col("t1")).as("n1"),
      steps.indices.drop(1).map(i =>
        count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
  }
}
