package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, TernaryExpression, UnaryExpression}
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
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_q8"),
      new ExpressionInfo(classOf[CosineSimQ8].getName, "cosine_sim_q8"),
      (children: Seq[Expression]) =>
        CosineSimQ8(children(0), children(1), children(2))))
  }
}

/** `cosine_sim_q8(qv, scale, q)` — cosine of an int8-quantized vector
  * (array<tinyint> codes + per-row double scale, the
  * [[graft.operators.AnnIndex.int8Quantize]] layout) against an
  * `array<double>` query, dequantizing INSIDE the fused primitive loop.
  *
  * Replaces `cosine_sim(transform(qv, x -> CAST(x AS DOUBLE) * scale), q)`
  * on the int8 serving paths: Spark's ArrayTransform is CodegenFallback
  * and boxes one lambda eval per ELEMENT — n·d boxed calls per probe on
  * the store scan, the exact overhead class the repo's other native
  * kernels exist to remove. Arithmetic is the HOF chain verbatim —
  * per element xv = (double)code * scale, then the [[CosineSim]]
  * accumulation order — so results are bit-identical (spec + property
  * pinned) and the DuckDB oracle, which replays the dequantized math,
  * still hash-matches. The HOF form stays in the specs as the reference.
  */
case class CosineSimQ8(qv: Expression, scale: Expression, q: Expression)
    extends TernaryExpression {

  override def first: Expression = qv
  override def second: Expression = scale
  override def third: Expression = q
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_q8"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CosineSimQ8 =
    copy(qv = f, scale = s, q = t)

  override def nullSafeEval(a: Any, s: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], s.asInstanceOf[Double],
      b.asInstanceOf[ArrayData])

  def compute(x: ArrayData, scale: Double, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getByte(i).toDouble * scale
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s, b) => {
      val ref = ctx.addReferenceObj("cosineQ8Expr", this, classOf[CosineSimQ8].getName)
      s"${ev.value} = $ref.compute($a, $s, $b);"
    })
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
