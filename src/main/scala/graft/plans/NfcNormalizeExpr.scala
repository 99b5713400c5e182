package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the text-
  * cleanup step every large-corpus curation pipeline runs before hashing
  * or tokenizing (decomposed sequences like `e` + U+0301 and precomposed
  * U+00E9 must dedup/fingerprint identically; DuckDB ships the same
  * operation as `nfc_normalize`).
  *
  * Spark has no NFC builtin and a Scala UDF would box every row, so this
  * is a codegen'd `UnaryExpression` like [[IpToIntExpr]]:
  *  - ASCII fast path: NFC is the identity on ASCII, detected by a raw
  *    byte scan on the UTF8String — no decode, no allocation, and the
  *    input buffer is returned as-is. On a mostly-ASCII 100 TB corpus
  *    this makes the operator a near-free byte scan.
  *  - Non-ASCII rows (and only those) round-trip through
  *    `java.text.Normalizer` (ICU-equivalent NFC from the JDK).
  *  - eval and doGenCode share one static kernel, so interpreted and
  *    compiled paths agree by construction; participates in
  *    WholeStageCodegen (no CodegenFallback).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {

  /** NFC-normalize; returns the INPUT object unchanged for ASCII-only
    * strings (byte scan, no decode). */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      // Normalizer.isNormalized is a cheap verify pass; skip the rebuild
      // when the non-ASCII text is already composed (the common case for
      // web text, which is mostly NFC already).
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  /** Column-level entry point. */
  def nfc(c: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(c)))

  /** SQL registration: SELECT nfc_normalize(text) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalizeExpr(exprs.head), "built-in")
}
