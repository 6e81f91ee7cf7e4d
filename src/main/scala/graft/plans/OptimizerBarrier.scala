package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that REPORTS non-determinism to the optimizer — the
  * guide §4.4 trick (mark expensive, pushdown-duplicated expressions
  * non-deterministic so the optimizer may not reorder, duplicate or
  * inline them), applied to a native expression.
  *
  * Why it exists (r17): `FuzzyJoinRewrite` projects each side's blocking
  * key ARRAY (a ~34 KB expression tree: 75 positional substrings over a
  * name that is itself a 6×md5 synthesis — interpreted higher-order
  * functions, ~3 ms/row) and explodes it. `InferFiltersFromGenerate`
  * then adds `size(keys) > 0 AND isnotnull(keys)` on the exploded
  * attribute — a predicate with ZERO value here (explode with
  * outer=false already drops empty arrays, and an inlined expression can
  * never reach PushedFilters) — and `PushPredicateThroughNonJoin`
  * substitutes the alias on the way down, duplicating the entire key
  * expression into a per-row Filter BELOW the project. Measured: a
  * 3.4 s single-task stage per side per run at sf0.1 (the whole cost of
  * `fuzzy_join_rule`/`fuzzy_semi_rule` beyond the blocked join itself).
  *
  * Wrapping the projected key array in this barrier makes the alias
  * non-substitutable (non-deterministic expressions cannot be pushed
  * through or duplicated), so the inferred filter stays ABOVE the
  * project, referencing the materialized array — a cheap no-op. The
  * expression itself is pure identity: evaluation and codegen delegate
  * to the child; results are unchanged (driver-verified: the fuzzy
  * entries' oracles state the naive joins).
  */
@ExpressionDescription(usage = "_FUNC_(expr) - identity; optimizer barrier (internal).")
case class OptimizerBarrier(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  // the whole point: refuse optimizer moves that assume re-evaluation is free
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): OptimizerBarrier =
    copy(child = newChild)
}
