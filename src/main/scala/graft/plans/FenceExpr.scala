package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer fence: a zero-cost passthrough marked nondeterministic so
  * Catalyst will neither collapse the Project that computes the child
  * nor push a Filter's predicate back through it.
  *
  * WHY IT EXISTS (r10 gap-tail audit): `select(expensive.as("x"))
  * .filter(p(x)).select(f(x), g(x))` looks like it evaluates
  * `expensive` once, but PushDownPredicates substitutes the alias into
  * the predicate and CollapseProject substitutes it into the outer
  * projections — both are textbook wins for CHEAP expressions and a
  * silent 2× for a per-row kernel that dominates the scan stage
  * (q25's fingerprint array: measured 4.6 s filtered vs the 2.3 s
  * single-evaluation floor at sf0.1; at 100 TB that is twice the CPU
  * of the entire map stage). Wrapping the alias body in `fence()`
  * keeps the expression in its own Project: the filter and every
  * consumer above read the materialized ATTRIBUTE instead of
  * re-deriving the expression. Column pruning below the fence is
  * unaffected (the child's references are still visible), and codegen
  * sees a plain passthrough — no virtual call, no boxing.
  *
  * Use it ONLY on expressions that are (a) expensive per row and
  * (b) consumed more than once across operator boundaries; fencing a
  * cheap expression just denies Catalyst legitimate pushdown. The
  * child must be genuinely deterministic — the flag is a fence, not a
  * semantics change (same contract as Spark's own `AssertNotNull`
  * tricks; the value is bit-identical either way).
  */
case class FenceExpr(child: Expression) extends UnaryExpression {
  // the whole point: make every alias-substitution rule keep its hands
  // off the Project that computes this
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "fence"
  override protected def withNewChildInternal(
      newChild: Expression): FenceExpr = copy(child = newChild)
}

object FenceExpr {
  /** Column entry point: `select(FenceExpr.fence(expensive).as("x"))`. */
  def fence(c: Column): Column =
    GraftSqlBridge.column(FenceExpr(GraftSqlBridge.expression(c)))
}
