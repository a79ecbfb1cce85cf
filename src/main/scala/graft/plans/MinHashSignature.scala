package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression computing a 64-permutation MinHash signature
  * from an `array<long>` of element hashes (SURVEY.md §7.4 — the "custom
  * Expression beats UDF" path).
  *
  * Why an Expression and not the higher-order-function fold: Spark
  * evaluates HOF lambdas interpreted, with per-element boxing — the
  * 64-perm × ~300-shingle fold costs ~100 M boxed evaluations at sf0.1
  * (~8 s measured). This `eval` runs the same arithmetic as a tight
  * primitive loop over `ArrayData` (~0.1 s), with no serialization
  * boundary (unlike a Scala UDF). doGenCode keeps the surrounding stage in
  * whole-stage codegen via a reference-object callback.
  *
  * Permutation family: Carter-Wegman `(a·x + b) mod (2³¹−1)` with the base
  * hash folded into [0, p); coefficients derive from a fixed seed, so
  * signatures are deterministic across executors, sessions, and rounds.
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): GenericArrayData = {
    import MinHashSignature._
    val n = arr.numElements()
    val mins = Array.fill(NPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val m = arr.getLong(i) % P
      val hp = if (m < 0) m + P else m
      var j = 0
      while (j < NPerm) {
        val v = (As(j) * hp + Bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // keep the surrounding stage in whole-stage codegen (see CosineSim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("mhExpr", this, classOf[MinHashSignature].getName)
      s"${ev.value} = $ref.compute($a);"
    })
}

object MinHashSignature {
  val NPerm = 64
  val P: Long = 2147483647L // Mersenne prime 2³¹−1
  private val rnd = new scala.util.Random(7L)
  val As: Array[Long] = Array.fill(NPerm)(1L + math.abs(rnd.nextLong()) % (P - 1))
  val Bs: Array[Long] = Array.fill(NPerm)(math.abs(rnd.nextLong()) % P)

  /** Register `minhash_sig(array<long>)` on a session builder via the
    * public extensions API.
    */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSignature(children.head)))
}
