package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity marker that OPTS ITS HOST OPERATOR OUT of whole-stage
  * codegen (CollapseCodegenStages skips any node whose expressions
  * contain a [[CodegenFallback]]), while the operator still compiles
  * through the NON-fused path — e.g. ProjectExec's
  * `UnsafeProjection.create`, where a single oversized expression
  * tree can be method-split and short-circuited in ways the fused
  * `doConsume` body cannot.
  *
  * Why this exists (measured, CanDecode wide path, 2 M lines): a
  * ~400-branch decode coalesce sits at janino's 64 KB method cliff
  * under WSCG — whole-stage splits a Project into methods per OUTPUT
  * expression, never inside one — so the fused compile FAILS and
  * Spark falls back to exactly the non-fused projection anyway
  * (2.26 s), after paying a doomed compile and logging an ERROR.
  * Alternatives were slower: materializing shared subexpressions in a
  * prep stage re-materializes every row (5.13 s), splitting the
  * decode into group columns loses coalesce's first-match
  * short-circuit (6.46 s). Wrapping ONE cheap carried column in this
  * marker keeps the fast shape and makes the non-fused choice
  * DETERMINISTIC — no cliff, no wasted compile, no error noise.
  *
  * Per-row cost: one virtual `eval` call + boxing for the wrapped
  * column only (wrap something tiny, never the hot expression). */
case class NoWholeStageCodegen(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  // pure codegen PASS-THROUGH: extending CodegenFallback is what the
  // planner's exclusion check pattern-matches on, but the trait's
  // eval-by-reference body would interpret the child per row — the
  // override keeps the NON-fused projection fully compiled
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override def prettyName: String = "graft_no_wscg"
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
