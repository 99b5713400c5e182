package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension: range lookup join as a first-class
  * logical node + planner strategy + physical operator.
  *
  * This is the reference's exact enrichment algorithm — binary search
  * over a sorted interval table (`/root/reference/bin/ipinfo.py:207,
  * 217-238`) — promoted to a Spark operator: the dimension is collected
  * once, sorted by `lo`, broadcast, and each probe row does an O(log n)
  * search. Catalyst's own plan for the same non-equi join is
  * BroadcastNestedLoopJoin, O(n) per probe row; the bucketed-equi-join
  * composition (operators/RangeJoin.bucketed) is O(1)-ish but pays a
  * generate + wider broadcast. This node is the third point in that
  * design space and the showcase for the LogicalPlan/Strategy/ExecNode
  * extension tier (SURVEY §7.3).
  *
  * Semantics: LEFT OUTER, intervals assumed non-overlapping (first
  * match by sort order wins otherwise — same as the reference's
  * bisect). Key/lo/hi must be integral (evaluated as Long).
  */
object RangeLookup {

  /** Logical node. key references left output; lo/hi reference right. */
  final case class RangeLookupJoin(
      left: LogicalPlan, right: LogicalPlan,
      key: Expression, lo: Expression, hi: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): RangeLookupJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Physical operator: broadcast sorted arrays + per-partition binary
    * search. */
  final case class RangeLookupExec(
      key: Expression, lo: Expression, hi: Expression,
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): RangeLookupExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      // driver-side: evaluate bounds, sort by lo, broadcast
      val boundLo = BindReferences.bindReference(lo, right.output)
      val boundHi = BindReferences.bindReference(hi, right.output)
      val dimRows = right.executeCollect()
      val sorted = dimRows
        .map { r =>
          (boundLo.eval(r).asInstanceOf[Number].longValue(),
            boundHi.eval(r).asInstanceOf[Number].longValue(),
            r.copy())
        }
        .sortBy(_._1)
      val los = sorted.map(_._1)
      val his = sorted.map(_._2)
      val rows = sorted.map(_._3)
      val bcast = sparkContext.broadcast((los, his, rows))

      val boundKey = BindReferences.bindReference(key, left.output)
      val rightArity = right.output.size
      val outAttrs = output
      left.execute().mapPartitions { iter =>
        val (blos, bhis, brows) = bcast.value
        val joiner = new JoinedRow
        val nullRight = new GenericInternalRow(rightArity)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        iter.map { l =>
          val k = boundKey.eval(l)
          var matched: InternalRow = nullRight
          if (k != null) {
            val key = k.asInstanceOf[Number].longValue()
            // rightmost interval with lo <= key
            var fromIdx = 0
            var toIdx = blos.length
            while (fromIdx < toIdx) {
              val mid = (fromIdx + toIdx) >>> 1
              if (blos(mid) <= key) fromIdx = mid + 1 else toIdx = mid
            }
            val idx = fromIdx - 1
            if (idx >= 0 && key <= bhis(idx)) matched = brows(idx)
          }
          proj(joiner(l, matched))
        }
      }
    }
  }

  /** Planner strategy. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case RangeLookupJoin(l, r, k, lo, hi) =>
        RangeLookupExec(k, lo, hi, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Idempotent runtime registration — works on any existing session
    * (no restart with spark.sql.extensions needed). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(Strategy))
      spark.experimental.extraStrategies = cur :+ Strategy
  }

  /** User API: left-outer range lookup of probe.keyCol in
    * dim.[loCol, hiCol]. */
  def join(probe: DataFrame, dim: DataFrame,
           keyCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark = probe.sparkSession
    register(spark)
    val node = RangeLookupJoin(
      GraftSqlBridge.logicalPlan(probe),
      GraftSqlBridge.logicalPlan(dim),
      GraftSqlBridge.expression(probe(keyCol)),
      GraftSqlBridge.expression(dim(loCol)),
      GraftSqlBridge.expression(dim(hiCol)))
    GraftSqlBridge.dataset(spark, node)
  }
}
