package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for IPv4 dotted-quad → Long — the
  * codegen'd upgrade of graft.functions.IpFunctions.ipToInt (which
  * composes split/element_at/rlike and allocates an array per row).
  *
  * This version parses the UTF8String bytes in place: no regex, no
  * split, no allocation; invalid input → null (the reference's None,
  * ipinfo.py:33-41). Both eval and doGenCode route through one static
  * byte-walker, so interpreted and compiled paths agree by
  * construction. Participates in WholeStageCodegen (no CodegenFallback).
  */
case class IpToIntExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_to_int requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_to_int"

  override def nullSafeEval(input: Any): Any = {
    val r = IpToIntExpr.parse(input.asInstanceOf[UTF8String])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long ${ev.value}_r = graft.plans.IpToIntExpr.parse($c);
         |if (${ev.value}_r < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IpToIntExpr =
    copy(child = newChild)
}

object IpToIntExpr {

  /** Single-pass byte parser; returns -1 for invalid input.
    * Valid ⇔ exactly 4 dot-separated runs of 1-3 digits, each ≤ 255. */
  def parse(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var octet = 0
    var digits = 0
    var dots = 0
    var acc = 0L
    while (i < n) {
      val ch = s.getByte(i)
      if (ch == '.') {
        if (digits == 0 || octet > 255 || dots == 3) return -1L
        acc = acc * 256L + octet
        dots += 1; octet = 0; digits = 0
      } else if (ch >= '0' && ch <= '9') {
        digits += 1
        if (digits > 3) return -1L
        octet = octet * 10 + (ch - '0')
      } else return -1L
      i += 1
    }
    if (digits == 0 || octet > 255 || dots != 3) -1L
    else acc * 256L + octet
  }

  /** Column-level entry point. */
  def ipToInt(c: Column): Column =
    GraftSqlBridge.column(IpToIntExpr(GraftSqlBridge.expression(c)))

  /** SQL registration: SELECT ip_to_int(ip) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ip_to_int", exprs => IpToIntExpr(exprs.head), "built-in")
}
