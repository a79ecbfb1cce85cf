package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash-64: `simhash64(text)` → the 64-bit near-dup fingerprint
  * (tokens vote ±1 per bit weighted by their xxhash64 bits; the sign of
  * each bit-sum is the fingerprint bit — graft.operators.Dedup Scaladoc,
  * reference analog SURVEY.md §2.4 A4 extension).
  *
  * Bit-for-bit equal to the higher-order-function formulation it replaces
  * (`aggregate(zip_with(...))` over `split(text, ' ')` with Spark's
  * default-seed xxhash64 — DedupSimilaritySpec pins the equality): same
  * whitespace split incl. empty tokens, same per-token hash
  * (XXH64 over UTF-8 bytes, seed 42), same vote/threshold rule.
  *
  * Why native: the HOF fold allocates two 64-element boxed arrays per
  * TOKEN (the zip_with lambda re-evaluates its body per element); this is
  * one primitive `long[64]` per row and a tight two-level loop — the
  * dominant map cost of the fingerprint artifact build at corpus scale.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  // keep the surrounding stage in whole-stage codegen (see CosineSim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
      s"${ev.value} = $ref.compute($t);"
    })
}

object SimHash64 {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => SimHash64(c)
        case other =>
          throw new IllegalArgumentException(
            s"simhash64(text) expects one argument, got $other")
      }))
}
