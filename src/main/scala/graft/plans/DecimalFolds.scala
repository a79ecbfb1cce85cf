package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Order-insensitive DECIMAL(·,12) array folds, native.
  *
  * Several operators sum per-element double terms through DECIMAL scale 12
  * so the sum is exact and order-insensitive (the oracle's SUM over
  * unnested rows has no deterministic order — q_embed_outliers /
  * q_quantize_embed, SparkEntry.oracleSql). The higher-order
  * `aggregate(zip_with(...), 0 as dec, (acc, x) => ...)` form evaluates an
  * interpreted lambda tree per element (Cast + Add + Decimal boxing) —
  * measured as the dominant per-row cost of the embed probes. These
  * expressions run the identical arithmetic in one primitive loop:
  *
  *   term_i → new BigDecimal(Double.toString(x)).setScale(12, HALF_UP)
  *
  * is bit-for-bit Spark's `Cast(double → DECIMAL(p,12))` (Decimal.apply
  * goes through scala.math.BigDecimal(d), which is Double.toString-based,
  * then changePrecision rounds HALF_UP); the accumulation is exact at
  * scale 12 exactly like the fold's `(acc + t).cast(dec)` chain,
  * INCLUDING overflow: past the decimal(28,12) bound (|v| ≥ 1e16) the
  * HOF's per-step cast nulls in non-ANSI mode and these folds null at
  * the same step (DecimalFoldSpec pins both regimes; under ANSI the HOF
  * chain would THROW there — the folds deliberately keep the non-ANSI
  * null, a total function being the right contract for an expression on
  * the hot path); NaN/Infinity terms
  * null like the cast does; the double result equals the call sites'
  * final `.cast("double")` (BigDecimal.doubleValue). Null propagation
  * matches the HOF form: a null element (or a length mismatch, which
  * `zip_with` pads into null terms) nulls the whole result.
  *
  * Codegen: like [[CosineSim]], the generated Java calls back into
  * `compute` through a reference object so the surrounding stage stays
  * whole-stage-compiled.
  */
object DecimalFolds {
  private val Twelve = 12

  /** The decimal(28,12) magnitude bound: 16 integral digits. The HOF
    * chain's per-step `cast(… as decimal(28,12))` returns NULL in
    * non-ANSI mode the moment a term or the accumulator can no longer
    * fit precision 28 — i.e. |value| ≥ 1e16. */
  private val Dec28_12Bound = new JBigDecimal(java.math.BigInteger.TEN.pow(16))

  private def overflows(v: JBigDecimal): Boolean =
    v.abs.compareTo(Dec28_12Bound) >= 0

  /** dec12-exact sum of the terms; null when any term is null, and null
    * when a term or the running sum crosses the decimal(28,12) bound —
    * matching the HOF `aggregate(cast…)` chain's non-ANSI overflow
    * behavior exactly (it nulls; a finite double here would be a silent
    * divergence for pathological magnitudes — DecimalFoldSpec pins this).
    */
  private[plans] def sumTerms(terms: Iterator[java.lang.Double]): Any = {
    var acc = JBigDecimal.ZERO
    while (terms.hasNext) {
      val t = terms.next()
      if (t == null) return null
      // NaN/Infinity: the non-ANSI double→decimal cast nulls them (the
      // string constructor would throw here)
      if (t.isNaN || t.isInfinite) return null
      val term = new JBigDecimal(java.lang.Double.toString(t))
        .setScale(Twelve, RoundingMode.HALF_UP)
      if (overflows(term)) return null
      acc = acc.add(term)
      if (overflows(acc)) return null
    }
    acc.doubleValue()
  }

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dsum12"),
      new ExpressionInfo(classOf[DecSum12].getName, "dsum12"),
      (children: Seq[Expression]) => DecSum12(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sq_dist_sum12"),
      new ExpressionInfo(classOf[SqDistSum12].getName, "sq_dist_sum12"),
      (children: Seq[Expression]) => SqDistSum12(children(0), children(1))))
  }
}

/** `dsum12(array<double>)` — Σ_i dec12(x_i) as DOUBLE. */
case class DecSum12(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsum12"

  override protected def withNewChildInternal(newChild: Expression): DecSum12 =
    copy(child = newChild)

  override def nullSafeEval(arr: Any): Any =
    compute(arr.asInstanceOf[ArrayData])

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    DecimalFolds.sumTerms(new Iterator[java.lang.Double] {
      private var i = 0
      def hasNext: Boolean = i < n
      def next(): java.lang.Double = {
        val v = if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))
        i += 1
        v
      }
    })
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("decSumExpr", this, classOf[DecSum12].getName)
      val r = ctx.freshName("decSumRes")
      s"""Object $r = $ref.compute($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
}

/** `sq_dist_sum12(a, b)` — Σ_i dec12((a_i - b_i)²) as DOUBLE; null on
  * length mismatch or null element, exactly like the
  * `aggregate(zip_with(a, b, (x, m) => (x-m)*(x-m)), …)` form it fuses.
  */
case class SqDistSum12(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist_sum12"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistSum12 =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(x: ArrayData, y: ArrayData): Any = {
    // zip_with extends the shorter side with nulls → a null term → null
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    DecimalFolds.sumTerms(new Iterator[java.lang.Double] {
      private var i = 0
      def hasNext: Boolean = i < n
      def next(): java.lang.Double = {
        val v: java.lang.Double =
          if (x.isNullAt(i) || y.isNullAt(i)) null
          else {
            val d = x.getDouble(i) - y.getDouble(i)
            java.lang.Double.valueOf(d * d)
          }
        i += 1
        v
      }
    })
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("sqDistExpr", this, classOf[SqDistSum12].getName)
      val r = ctx.freshName("sqDistRes")
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
}
