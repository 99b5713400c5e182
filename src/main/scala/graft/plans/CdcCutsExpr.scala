package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for content-defined-chunking cut
  * positions (Rabin/FastCDC family): ONE rolling-hash pass over the
  * document emits every boundary position, replacing q188's first two
  * formulations — the interpreted `filter(sequence(...))` HOF (11 s at
  * sf0.1) and the exploded md5-per-position projection (~|chars| md5 +
  * hex-conv calls, 11.5 s at sf0.1, plus a cut-collect groupBy and a
  * doc re-join). This expression is O(|text|) integer arithmetic with
  * no allocation in the loop, runs inside WholeStageCodegen (both eval
  * and doGenCode route through one static walker), and returns the
  * sorted cut array directly per row — the whole
  * explode→filter→collect_list→join pipeline collapses to a map-only
  * projection with zero shuffles before the chunk census.
  *
  * Boundary function (engine-portable, all-integer, so the DuckDB
  * oracle reproduces it exactly with a HUGEINT polynomial):
  * over 1-based code-point positions i with WINDOW ≤ i < n, let
  *   h(i) = (Σ_{k=0..7} cp(i-7+k) · 257^(7-k)) mod 2^31
  * (a degree-7 polynomial of the trailing 8 code points, maintained
  * incrementally as the classic Rabin update h ← (h − cp_out·257^7)·257
  * + cp_in mod 2^31), and cut after position i iff
  *   (h(i) · 2654435761) mod 2^31 < 2^31/64
  * — Fibonacci-hash bit mixing so the mod-2^31 polynomial's low-order
  * structure can't bias the 1/64 expected cut rate. The last position
  * (i = n) never cuts: the final chunk always closes at end-of-doc.
  *
  * Cf. the reference's whole-file dedup-by-content checksum
  * (maillogsentinel/sql_importer.py anti-dedup); chunk-level CDC is the
  * sub-file generalization a storage/training-corpus pipeline needs.
  */
case class CdcCutsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcCutsExpr.cuts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.CdcCutsExpr.cuts($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCutsExpr =
    copy(child = newChild)
}

object CdcCutsExpr {

  val Window = 8
  val Mod: Long = 1L << 31 // 2^31
  val Base: Long = 257L
  val Mix: Long = 2654435761L // Knuth's 2^32/φ
  val Thresh: Long = Mod / 64 // expected cut rate 1/64

  /** 257^7 mod 2^31 — the outgoing-code-point weight in the Rabin
    * update. Computed, not hand-typed, so it can't silently drift from
    * the oracle's exact-HUGEINT polynomial. */
  val BasePow7: Long = {
    var x = 1L
    var k = 0
    while (k < Window - 1) { x = x * Base % Mod; k += 1 }
    x
  }

  /** Single pass over the code points; returns sorted 1-based cut
    * positions. Positions index CODE POINTS (not UTF-16 units, not
    * bytes) to match DuckDB's substr/length/unicode semantics for
    * non-ASCII text. */
  def cuts(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val len = str.length
    val n = str.codePointCount(0, len).toLong
    val win = new Array[Int](Window)
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var h = 0L
    var ci = 0 // UTF-16 index
    var pos = 0L // 1-based code-point position of the cp just consumed
    while (ci < len) {
      val cp = str.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      val slot = ((pos - 1) % Window).toInt
      if (pos > Window) {
        h = ((h - win(slot) * BasePow7) % Mod + Mod) % Mod
      }
      h = (h * Base + cp) % Mod
      win(slot) = cp
      if (pos >= Window && pos < n && h * Mix % Mod < Thresh) {
        out += pos
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-level entry point. */
  def cdcCuts(c: Column): Column =
    GraftSqlBridge.column(CdcCutsExpr(GraftSqlBridge.expression(c)))

  /** SQL registration: SELECT cdc_cuts(text) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_cuts", exprs => CdcCutsExpr(exprs.head), "built-in")
}
