package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the FIXED-POINT squared L2 distance
  * Σ ⌊(aᵢ − bᵢ)²·10¹⁰⌋ (BIGINT) — the codegen'd upgrade of the
  * zip_with/aggregate formulation shared by the k-means family
  * (KMeansCluster.sqDistFixed), SemDeDup's pair kernel
  * (SemDedup.sqDistFixedCols), and the diversity objectives. Exactly
  * [[DotDoubleExpr]]'s story applied to the distance metric: the
  * higher-order functions are CodegenFallback (interpreted lambda
  * dispatch + a materialized per-row intermediate array, breaking the
  * surrounding WholeStageCodegen span), and this kernel sits inside
  * k-means assignment scans and the SemDeDup self-join filter — the
  * hottest per-row loops the engine runs at scale.
  *
  * Semantics are EXACTLY the HOF formulation's under ANSI mode (the
  * Spark 4 default, and every session this repo builds): per element
  * `(long) Math.floor(((a−b)·(a−b))·10¹⁰)` — same IEEE op order, same
  * double→long saturation — summed left-to-right via
  * `Math.addExact`, so a sum past Long.MaxValue throws exactly like
  * ANSI's Add (SqDistFixedExprSpec asserts both the bit-parity and
  * the overflow throw); length mismatch or a null element yields
  * null. In a NON-ANSI session the HOF would wrap where this kernel
  * still throws — failing loudly on a meaningless distance either
  * way is the repo convention.
  */
case class SqDistFixedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqdist_fixed requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = LongType
  // always nullable: length mismatch / null elements null the result
  override def nullable: Boolean = true
  override def prettyName: String = "sqdist_fixed"

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDistFixedExpr.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $acc = 0L;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc = Math.addExact($acc, (long) Math.floor(($d * $d) * 1.0E10));
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistFixedExpr =
    copy(left = newLeft, right = newRight)
}

object SqDistFixedExpr {

  /** Interpreted-eval twin of the generated loop: null on length
    * mismatch or any null element (the zip_with semantics). */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc = Math.addExact(acc, math.floor((d * d) * 1.0e10).toLong)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Column-level entry point. */
  def sqDistFixed(a: Column, b: Column): Column =
    GraftSqlBridge.column(SqDistFixedExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private[plans] def fromExprs(exprs: Seq[Expression]): SqDistFixedExpr = {
    require(exprs.length == 2,
      s"sqdist_fixed expects 2 arguments, got ${exprs.length}")
    SqDistFixedExpr(exprs(0), exprs(1))
  }

  /** SQL registration: SELECT sqdist_fixed(v, c) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sqdist_fixed", fromExprs, "built-in")
}

/** Optimizer rule: rewrite the idiomatic HOF fixed-point distance —
  * `aggregate(zip_with(a, b, (x, c) -> floor(((x−c)·(x−c))·1e10)
  * :: bigint), 0L, (acc, d) -> acc + d)` — into [[SqDistFixedExpr]],
  * the [[DotDoubleRule]] treatment applied to the distance kernel: a
  * user (or SQL author) writing the declarative form gets the fused
  * codegen'd loop without knowing the native function exists. The
  * rewrite is semantics-preserving under ANSI mode (the Spark 4
  * default): identical per-element IEEE op order, identical null
  * contract, overflow throws on both sides (Math.addExact vs ANSI
  * Add), and integer addition makes the fold order immaterial — in a
  * non-ANSI session the HOF wraps on overflow where the kernel
  * throws, a strictly-louder failure. Guards are structural — double arrays, both
  * squared-difference legs the SAME ordered (x, c) variable pair
  * drawn from the zip_with variables, the exact 1e10 scale and 0L
  * seed (raw-bits tests), an identity finish lambda; a no-op
  * LONG→LONG cast over the floor (present until SimplifyCasts runs)
  * is accepted and ignored. */
object SqDistFixedRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, Floor, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isArrDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Strip a redundant LONG→LONG cast (floor already returns BIGINT;
    * the Column form writes `.cast("long")` anyway). */
  private def uncast(e: Expression): Expression = e match {
    case Cast(inner, LongType, _, _) if inner.dataType == LongType => inner
    case other => other
  }

  private def isTenTo10(l: Expression): Boolean = l match {
    case Literal(d: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) ==
        java.lang.Double.doubleToRawLongBits(1.0e10)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(body,
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(
              Add(aa: NamedLambdaVariable, ab: NamedLambdaVariable, _),
              Seq(mc: NamedLambdaVariable, me: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fa: NamedLambdaVariable), _))
          if isArrDouble(l) && isArrDouble(r) &&
            Set(aa.exprId, ab.exprId) == Set(mc.exprId, me.exprId) &&
            fin.exprId == fa.exprId &&
            (uncast(body) match {
              case Floor(Multiply(
                    Multiply(
                      Subtract(x1: NamedLambdaVariable, c1: NamedLambdaVariable, _),
                      Subtract(x2: NamedLambdaVariable, c2: NamedLambdaVariable, _), _),
                    scale, _)) =>
                isTenTo10(scale) &&
                  x1.exprId == x2.exprId && c1.exprId == c2.exprId &&
                  Set(x1.exprId, c1.exprId) == Set(zx.exprId, zy.exprId)
              case _ => false
            }) =>
        SqDistFixedExpr(l, r)
    }
}
