package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** `weighted_dot_sorted(a, b)` — sparse dot product of two
  * `array<struct<long key, long value>>` columns, both sorted ascending by
  * key: Σ a.value · b.value over the keys both sides share, via a linear
  * merge walk.
  *
  * This is the scoring kernel for language-ID (reference semantics:
  * waddleml scores documents against per-language n-gram frequency
  * profiles): the document side is `ngram_hashes(text, 2, 'char_counts')`
  * (RLE of sorted hashes ⇒ sorted by construction), the profile side a
  * sorted 40-entry (hash, weight) array. Scoring a doc against 5 profiles
  * is then 5 map-side merge walks on one row — no per-bigram explode, no
  * broadcast hash probe per occurrence, and no per-doc aggregation
  * shuffle. The equivalent join+groupBy materializes |docs|·|distinct
  * bigrams| rows first.
  */
case class WeightedDotSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "weighted_dot_sorted"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedDotSorted =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val xr = x.getStruct(i, 2)
      val yr = y.getStruct(j, 2)
      val xk = xr.getLong(0)
      val yk = yr.getLong(0)
      if (xk == yk) { s += xr.getLong(1) * yr.getLong(1); i += 1; j += 1 }
      else if (xk < yk) i += 1
      else j += 1
    }
    s
  }

  // keep the surrounding stage in whole-stage codegen (see CosineSim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("wdsExpr", this, classOf[WeightedDotSorted].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })
}

object WeightedDotSorted {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("weighted_dot_sorted"),
      new ExpressionInfo(classOf[WeightedDotSorted].getName, "weighted_dot_sorted"),
      (children: Seq[Expression]) => WeightedDotSorted(children(0), children(1))))
}
