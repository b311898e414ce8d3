package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.DataType

/** Identity wrapper whose ONLY effect is reporting `deterministic =
  * false`, which stops two optimizer behaviors that are catastrophic
  * around expensive per-row expressions:
  *
  *  - `PushDownPredicates` substituting the child into a Filter
  *    condition (FilterExec does no subexpression elimination, so a
  *    predicate built from N metric columns re-evaluates the child N
  *    times per row — measured 13 inlined copies of the quality gate's
  *    tokenize+profile subtree, an 8× slowdown at sf1 and ~40× at
  *    sf10 before this barrier);
  *  - `CollapseProject` duplicating the child into every referencing
  *    expression of a consuming projection.
  *
  * The child MUST itself be deterministic — results are unchanged; the
  * flag is a planning fence, not a semantics change. (Catalyst's own
  * `With`/`RewriteWithExpression` machinery cannot serve here: the
  * rewrite runs in the FIRST optimizer batch and the later pushdown
  * batches re-substitute the hoisted projections right back into the
  * filter.)
  *
  * Fence width: Catalyst's stock pushdown refuses to push ANY
  * predicate through a projection containing a non-deterministic
  * field, so the raw fence is PROJECT-WIDE — even a filter on a
  * pass-through id column loses parquet scan pruning.
  * [[graft.plans.PushThroughBarrierProjects]] (installed by
  * `GraftExtensions`) narrows it to alias-level: conjuncts not
  * touching a fenced alias push below and keep pruning; fenced-alias
  * conjuncts stay above. In a session WITHOUT the extension the
  * project-wide cost stands — there, apply source-level filters
  * BEFORE calling the metric producer.
  */
case class PushdownBarrier(child: Expression)
  extends UnaryExpression with UnaryLike[Expression] {
  require(child.deterministic,
    "PushdownBarrier wraps deterministic expressions only")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "pushdown_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}
