package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Evaluates to constant 0L while REFERENCING `child`: an
  * optimizer-opaque anchor that keeps a column alive through column
  * pruning and arithmetic simplification. Catalyst folds every
  * built-in provably-zero term (`id * 0`, `coalesce(id,0) * 0`, …) and
  * then prunes the column — which is usually exactly right, but
  * defeats plans that need two consumers' exchange subtrees to stay
  * IDENTICAL so `ReuseExchange` can fire (see
  * Curate.scoreByNgramFreq's single-pass experiment: the corpus-count
  * branch must keep `id` in its exchange input even though its
  * aggregate doesn't semantically need it). The optimizer cannot see
  * through a custom expression, so the reference — and the column —
  * survive.
  *
  * Adding 0L to a sum is exact for BIGINT arithmetic; the anchor
  * never changes a result, only a plan.
  */
case class PruningAnchor(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_pruning_anchor"

  override protected def nullSafeEval(input: Any): Any = 0L

  // evaluate (and discard) the child so semantics match the
  // interpreted path even for null inputs: the anchor itself is
  // non-nullable and always 0
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    child.eval(input)
    0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code + code"""
        long ${ev.value} = 0L;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): PruningAnchor =
    copy(child = c)
}

object PruningAnchor {
  def apply(c: Column): Column =
    Bridge.column(PruningAnchor(Bridge.expression(c)))
}
