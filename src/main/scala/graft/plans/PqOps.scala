package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Product-quantization kernels for the ANN serving path.
  *
  * PQ splits a d-dim vector into `m` subvectors and replaces each with
  * the index of its nearest subspace centroid (`ksub` per subspace,
  * ksub ≤ 256 so a code is ONE BYTE): a 64-dim f64 embedding (512 B)
  * becomes an `m`-byte code — 64× smaller at the default 8×256 geometry,
  * the compression tier that keeps a 100 TB corpus's serving store in
  * cluster memory where even the int8 tier (8×) cannot. Queries score
  * codes by ADC (asymmetric distance computation): a per-query lookup
  * table of subspace-centroid dot products, one add per subspace per
  * row — no per-row vector arithmetic at all.
  *
  * Both kernels are primitive loops over unboxed ArrayData with
  * reference-object codegen, the [[IvfArgmaxFlat]] discipline: the HOF
  * formulations would box per centroid per row exactly like the argmax
  * HOFs did (measured 7–20× there). Encoding normalizes the vector
  * first, so ADC dot products approximate COSINE directly.
  *
  * Determinism contract: sequential fold order, L2 argmin ties break to
  * the LOWER code, zero-norm vectors encode against the raw zeros (all
  * subspaces pick their L2-nearest-to-origin centroid, same every run).
  */
private object PqKernel {
  /** Nearest-centroid code for subvector j of the normalized vector. */
  def encodeSub(
      vn: Array[Double], cbs: ArrayData,
      j: Int, dsub: Int, ksub: Int): Byte = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < ksub) {
      val base = (j * ksub + c) * dsub
      var dist = 0.0; var t = 0
      while (t < dsub) {
        val diff = vn(j * dsub + t) - cbs.getDouble(base + t)
        dist += diff * diff
        t += 1
      }
      // strict <: ties keep the lower code
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best.toByte
  }

  /** The MINIMUM squared distance of the same argmin [[encodeSub]] runs —
    * i.e. the subspace's reconstruction error for the code it picks.
    * Kept as a twin loop (not a tupled return) so neither hot path boxes;
    * the argmin rule (strict <, lower code wins ties) must stay identical
    * to [[encodeSub]]'s or the audit would price codes the encoder never
    * emits.
    */
  def encodeSubErr(
      vn: Array[Double], cbs: ArrayData,
      j: Int, dsub: Int, ksub: Int): Double = {
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < ksub) {
      val base = (j * ksub + c) * dsub
      var dist = 0.0; var t = 0
      while (t < dsub) {
        val diff = vn(j * dsub + t) - cbs.getDouble(base + t)
        dist += diff * diff
        t += 1
      }
      if (dist < bestD) bestD = dist
      c += 1
    }
    bestD
  }

  /** Validate-and-normalize prologue shared by [[PqEncode]] and
    * [[PqReconErr]] — ONE copy of the geometry requires and the norm
    * semantics (zero-norm vectors pass through raw), so the audit can
    * never drift from the encoder on what a malformed input means.
    * Returns null for an empty vector (the expressions' null contract);
    * throws on a geometry mismatch. A non-finite element survives into
    * the result un-normalized (nrm is NaN/Inf, the guard skips): the
    * encoder then deterministically emits code 0 per subspace (every
    * NaN comparison is false) and the audit surfaces the row as
    * unpriceable — see [[PqReconErr]].
    */
  def normalizedOrNull(
      v: ArrayData, cbs: ArrayData, m: Int, ksub: Int,
      name: String): Array[Double] = {
    val d = v.numElements()
    if (d == 0) return null
    require(d % m == 0,
      s"$name: vector dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    require(cbs.numElements() == m * ksub * dsub,
      s"$name: codebook length ${cbs.numElements()} != m*ksub*dsub = ${m * ksub * dsub}")
    val vn = new Array[Double](d)
    var nrm = 0.0; var i = 0
    while (i < d) { val x = v.getDouble(i); vn(i) = x; nrm += x * x; i += 1 }
    if (nrm > 0.0) {
      val inv = 1.0 / math.sqrt(nrm)
      i = 0
      while (i < d) { vn(i) *= inv; i += 1 }
    }
    vn
  }
}

/** `pq_encode(v, cbs, m, ksub)` — normalize `v`, split into `m`
  * subvectors, emit the `m`-byte nearest-centroid code against the
  * flattened codebook `cbs` (layout `[j][c][t]` → j·ksub·dsub + c·dsub
  * + t). `m`/`ksub` must be foldable integer literals (enforced by the
  * registered builder); a codebook whose length is not m·ksub·(d/m)
  * throws loudly — a miswired codebook must never quietly mis-encode a
  * serving store.
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"
  // null for an empty vector even with non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _))
      if m > 0 && ksub > 0 && ksub <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_encode expects (array<double>, array<double>) with 0 < ksub <= 256 and m > 0")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(v: ArrayData, cbs: ArrayData): Any = {
    val vn = PqKernel.normalizedOrNull(v, cbs, m, ksub, "pq_encode")
    if (vn == null) return null
    val dsub = vn.length / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      out(j) = PqKernel.encodeSub(vn, cbs, j, dsub, ksub)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      val r = ctx.freshName("r")
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (byte[]) $r; }""".stripMargin
    })
}

object PqEncode {
  private[plans] def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => PqEncode(children(0), children(1),
        intLit(children(2), "pq_encode m"),
        intLit(children(3), "pq_encode ksub"))))
}

/** `pq_adc(codes, lut, ksub)` — asymmetric-distance score of an
  * `m`-byte PQ code against a per-query lookup table (layout
  * `[j][c]` → j·ksub + c, where lut[j][c] = dot of the normalized
  * query's subvector j with subspace centroid c): the approximate
  * cosine is Σ_j lut[j][code_j] — `m` adds per row, no vector math.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  // null for an empty code even with non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) if ksub > 0 && ksub <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (binary, array<double>) with 0 < ksub <= 256")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])

  def compute(codes: Array[Byte], lut: ArrayData): Any = {
    val m = codes.length
    if (m == 0) return null
    require(lut.numElements() == m * ksub,
      s"pq_adc: lut length ${lut.numElements()} != m*ksub = ${m * ksub}")
    var s = 0.0; var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      // loud, not garbage: for ksub < 256 a code byte >= ksub would read
      // a NEIGHBORING subspace's table entry (ArrayData.getDouble is not
      // bounds-checked on unsafe arrays) — a code encoded under a wider
      // geometry must never silently mis-score
      require(c < ksub,
        s"pq_adc: code $c in subspace $j >= ksub=$ksub — codes built under a different geometry")
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
      val r = ctx.freshName("r")
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
}

object PqAdc {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (children: Seq[Expression]) => PqAdc(children(0), children(1),
        PqEncode.intLit(children(2), "pq_adc ksub"))))
}

/** `pq_recon_err(v, cbs, m, ksub)` — fused audit kernel: normalize `v`,
  * run the EXACT `pq_encode` argmin per subspace, and return the squared
  * L2 reconstruction error of the decoded codes against the normalized
  * vector (Σ_j min-dist²_j) — the distortion the PQ serving tiers trade
  * for the 64× store, in one corpus pass with no codes column and no
  * join: the audit recomputes the encode by construction, so it can
  * never silently audit a different quantizer than the store uses
  * (both call [[PqKernel]]). Returns null for an empty OR non-finite
  * vector — the encoder emits a deterministic code 0 for the latter, so
  * the audit's null (surfaced as `n_bad` on the card) is the one place
  * a garbage embedding becomes visible before it serves.
  */
case class PqReconErr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_err"
  // null for an empty or non-finite vector even with non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _))
      if m > 0 && ksub > 0 && ksub <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_recon_err expects (array<double>, array<double>) with 0 < ksub <= 256 and m > 0")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconErr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(v: ArrayData, cbs: ArrayData): Any = {
    val vn = PqKernel.normalizedOrNull(v, cbs, m, ksub, "pq_recon_err")
    if (vn == null) return null
    val dsub = vn.length / m
    var err = 0.0
    var j = 0
    while (j < m) {
      err += PqKernel.encodeSubErr(vn, cbs, j, dsub, ksub)
      j += 1
    }
    // a non-finite input (NaN/Inf element) has no defined distortion —
    // every subspace distance is NaN, bestD stays +Infinity. Return null
    // so the card can COUNT these rows (n_bad) instead of an Infinity
    // that decimal-cast aggregation would silently drop from the avg
    // while the divisor still counted the row.
    if (java.lang.Double.isFinite(err)) err else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("pqReconErr", this, classOf[PqReconErr].getName)
      val r = ctx.freshName("r")
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
}

object PqReconErr {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("pq_recon_err"),
      new ExpressionInfo(classOf[PqReconErr].getName, "pq_recon_err"),
      (children: Seq[Expression]) => PqReconErr(children(0), children(1),
        PqEncode.intLit(children(2), "pq_recon_err m"),
        PqEncode.intLit(children(3), "pq_recon_err ksub"))))
}
