package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** `cosine_sim(a, b)` over two `array<double>` columns — fused single-pass
  * dot + norms in a primitive loop.
  *
  * Accumulation is left-to-right per sum, exactly like the
  * `aggregate(zip_with(...))` higher-order form it replaces and like
  * DuckDB's `list_cosine_similarity`, so oracle hash-compares still match
  * bit-for-bit before rounding.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Whole-stage-codegen support: the generated Java calls back into
    * [[compute]] through a reference object — the surrounding stage stays
    * compiled (CodegenFallback would eject the entire stage to the
    * interpreted path).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("cosineExpr", this, classOf[CosineSim].getName)
      s"${ev.value} = $ref.compute($a, $b);"
    })
}

object CosineSim {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
}

/** `hyperplane_bits(v, nbits, seed)` — random-hyperplane LSH signature of an
  * `array<double>`: bit i = sign(planeᵢ · v), returned as array<long> of
  * 0/1. Planes derive deterministically from (nbits, seed, dim) with the
  * same Gaussian stream as a seeded `scala.util.Random`, cached per shape —
  * identical on every executor with nothing shuffled or broadcast.
  */
case class HyperplaneBits(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bits"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)

  @transient private lazy val cachedDim = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def planes(dim: Int): Array[Array[Double]] =
    cachedDim.computeIfAbsent(dim, d => {
      val rnd = new scala.util.Random(seed)
      Array.fill(nBits)(Array.fill(d)(rnd.nextGaussian()))
    })

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val pl = planes(dim)
    val out = new Array[Long](nBits)
    var b = 0
    while (b < nBits) {
      val p = pl(b)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += p(i) * v.getDouble(i); i += 1 }
      out(b) = if (dot >= 0) 1L else 0L
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("hpExpr", this, classOf[HyperplaneBits].getName)
      s"${ev.value} = $ref.compute($v);"
    })
}

object HyperplaneBits {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bits"),
      new ExpressionInfo(classOf[HyperplaneBits].getName, "hyperplane_bits"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, _), Literal(s, _)) =>
          HyperplaneBits(c, n, s.toString.toLong)
        case other => throw new IllegalArgumentException(
          s"hyperplane_bits(v, nbits, seed) expects literal nbits/seed, got $other")
      }))
}
