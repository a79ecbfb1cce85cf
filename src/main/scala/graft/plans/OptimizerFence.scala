package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.SparkSessionExtensions

/** `opt_fence(expr)` — identity passthrough whose ONLY effect is clearing
  * the `deterministic` flag, pinning the enclosing predicate's placement in
  * the plan: `PushDownPredicates` refuses to move a filter whose condition
  * is non-deterministic, so a filter wrapped in the fence stays ABOVE the
  * exchange/project it was written over instead of migrating toward the
  * scan.
  *
  * Why this exists (q_json_extract, graft.operators.Tracking.jsonExtract):
  * on an under-split corpus [[graft.sources.Tables.spread]] inserts a
  * round-robin repartition to parallelize downstream map work, but a
  * filter whose predicate embeds the expensive map work (a full JSON parse
  * per row) is pushed straight through that repartition to the scan side —
  * re-serializing the parse in the lone scan task, which is the exact cost
  * the spread was inserted to remove (measured at sf0.1: 0.41 s pushed vs
  * 0.22 s fenced — DevJsonProbe). On a well-split corpus the fence is
  * free: the predicate can never reach parquet `PushedFilters` anyway (it
  * is not a plain column comparison), and the filter still fuses into the
  * same whole-stage-codegen span directly above the scan.
  *
  * The VALUE is pure — same input row, same output, every run (the child
  * must itself be deterministic; the constructor enforces it so the fence
  * cannot silently launder a genuinely nondeterministic expression past a
  * reviewer). Only the optimizer flag is cleared. Codegen: the fence emits
  * the child's code verbatim — zero instructions added, whole-stage spans
  * unbroken.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  require(child.deterministic,
    "opt_fence wraps deterministic expressions only — its contract is " +
      "'pure value, pinned placement', not a marker for real nondeterminism")

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opt_fence"

  // the point of the expression: a pure value the optimizer must not move
  override lazy val deterministic: Boolean = false

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
}

object OptimizerFence {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("opt_fence"),
      new ExpressionInfo(classOf[OptimizerFence].getName, "opt_fence"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => OptimizerFence(c)
        case other =>
          throw new IllegalArgumentException(
            s"opt_fence(expr) expects one argument, got $other")
      }))
}
