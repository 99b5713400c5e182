package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the array<double> dot product — the
  * codegen'd upgrade of Similarity.dotDouble's
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` formulation. Spark's
  * higher-order functions (ZipWith / ArrayAggregate) are
  * CodegenFallback: every row pays interpreted lambda dispatch and a
  * materialized intermediate products array, and their presence breaks
  * the surrounding WholeStageCodegen span. This expression is one fused
  * primitive loop — no allocation, no virtual calls — and participates
  * in codegen, so an ANN kernel (q34's prefilter, IVF assign/search,
  * StreamingAnn's buckets via norms) stays inside one codegen stage.
  *
  * Semantics match the HOF formulation on the library's vector columns
  * (equal-length, non-null elements): a strict left-to-right double
  * fold — bit-identical to zip_with+aggregate's fold order, which
  * DotDoubleExprSpec asserts. Mismatched lengths fold over the common
  * prefix (zip_with would inject nulls and poison the sum to null —
  * vectors of unequal dims are a caller bug either way); null ARRAY
  * input → null via the standard null-safe path.
  */
case class DotDoubleExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_double requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "dot_double"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotDoubleExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.plans.DotDoubleExpr.dot($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDoubleExpr =
    copy(left = newLeft, right = newRight)
}

object DotDoubleExpr {

  /** Strict left-to-right fold over the common prefix; one static
    * kernel serves eval and codegen so both paths agree. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column-level entry point. */
  def dotDouble(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotDoubleExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** SQL registration: SELECT dot_double(v, qv) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_double", exprs => DotDoubleExpr(exprs(0), exprs(1)), "built-in")
}
