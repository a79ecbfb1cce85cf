package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native coarse-quantizer argmax kernels for the IVF build/ingest path.
  *
  * The HOF formulations (`array_max(transform(pvs, …))` and the staged
  * bound-pruned variant) are interpreted CodegenFallback lambdas: every
  * pivot comparison allocates a boxed struct, and at a 4096-pivot
  * codebook the assignment of 100k vectors measured 12.6 s (flat HOF) /
  * 25.8 s (bound-pruned HOF) — allocation cost, not arithmetic. These
  * expressions run the identical math in primitive loops over the
  * unboxed ArrayData. The HOF forms remain in AnnIndex as
  * `private[graft]` references the spec pins bit-for-bit, the same
  * discipline as `simhash64` vs its HOF fold.
  *
  * Determinism contract (must match the HOF argmax exactly — the cell
  * ids are baked into on-disk indexes): similarity is the [[CosineSim]]
  * fold verbatim; ordering is Spark's DoubleType ordering
  * (java.lang.Double.compare — NaN greatest), ties on similarity break
  * to the LARGER pivot id (array_max over struct(s, pid)).
  */
private object IvfArgmaxKernel {
  /** [[CosineSim.compute]]'s exact fold, on raw arrays. */
  def cos(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Argmax over (sim, pivot_id) with Spark double ordering; returns
    * (bestSim, bestPid) folded into the provided running best. */
  def scanMembers(
      v: ArrayData, pvs: ArrayData,
      s0: Double, pid0: Long): (Double, Long) = {
    var bestS = s0; var bestP = pid0
    var i = 0
    val n = pvs.numElements()
    while (i < n) {
      val p = pvs.getStruct(i, 2)
      val s = cos(v, p.getArray(1))
      val pid = p.getLong(0)
      val c = java.lang.Double.compare(s, bestS)
      if (c > 0 || (c == 0 && pid > bestP)) { bestS = s; bestP = pid }
      i += 1
    }
    (bestS, bestP)
  }
}

/** `ivf_argmax(v, pvs)` — flat coarse assignment: the pivot id whose
  * vector maximizes cosine similarity to `v`
  * (`pvs: array<struct<pivot_id: long, pv: array<double>>>`).
  */
case class IvfArgmaxFlat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_argmax"
  // an EMPTY pivot array yields null even for non-null inputs; without
  // this override non-nullable children would make nullSafeCodeGen pin
  // ev.isNull to the false literal and the generated `false = true;`
  // fails to compile, ejecting the stage to interpreted execution
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfArgmaxFlat =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(v: ArrayData, pvs: ArrayData): Any =
    if (pvs.numElements() == 0) null
    else {
      val (_, pid) = IvfArgmaxKernel.scanMembers(
        v, pvs, Double.NegativeInfinity, Long.MinValue)
      pid
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("ivfArgmax", this, classOf[IvfArgmaxFlat].getName)
      val r = ctx.freshName("r")
      // fresh local: with non-nullable children nullSafeCodeGen emits
      // bodies into a shared flat scope, so sibling/nested natives would
      // collide on a fixed name
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }""".stripMargin
    })
}

object IvfArgmaxFlat {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("ivf_argmax"),
      new ExpressionInfo(classOf[IvfArgmaxFlat].getName, "ivf_argmax"),
      (children: Seq[Expression]) => IvfArgmaxFlat(children(0), children(1))))
}

/** `ivf_maxcos(v, pvs)` — the MAX cosine similarity of `v` against a
  * pivot set (same `pvs` layout as [[IvfArgmaxFlat]]). The D²-update
  * kernel for k-means++/k-means|| seeding: each seeding round folds the
  * newly drawn centers into every sample row's running
  * `min distance² = 2·(1 − max cos)` map-side, so the whole D² state
  * update is one codegen'd primitive loop — the HOF
  * `array_max(transform(…))` form allocates a boxed struct per pivot per
  * row, the same 20× penalty [[IvfArgmaxFlat]] exists to avoid.
  * Semantics: the [[IvfArgmaxKernel.cos]] fold verbatim, max under
  * Spark's double ordering (NaN greatest); null for an empty pivot set.
  */
case class IvfMaxCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "ivf_maxcos"
  // empty pivot array yields null (see IvfArgmaxFlat's nullable note)
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfMaxCos =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(v: ArrayData, pvs: ArrayData): Any =
    if (pvs.numElements() == 0) null
    else {
      val (s, _) = IvfArgmaxKernel.scanMembers(
        v, pvs, Double.NegativeInfinity, Long.MinValue)
      s
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("ivfMaxCos", this, classOf[IvfMaxCos].getName)
      val r = ctx.freshName("r")
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }""".stripMargin
    })
}

object IvfMaxCos {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("ivf_maxcos"),
      new ExpressionInfo(classOf[IvfMaxCos].getName, "ivf_maxcos"),
      (children: Seq[Expression]) => IvfMaxCos(children(0), children(1))))
}

/** `ivf_argmax_two(v, groups)` — EXACT two-level coarse assignment via
  * spherical triangle-inequality pruning
  * (`groups: array<struct<gid: int, sp: array<double>, radius: double,
  * pvs: array<struct<pivot_id: long, pv: array<double>>>>>`):
  *  - score the √k super-pivots; the best group's member argmax sets the
  *    incumbent;
  *  - a group whose bound cos(max(0, θ(v, sp) − radius)) + 1e-9 cannot
  *    reach the incumbent provably holds no better pivot (θ(v, p) ≥
  *    θ(v, sp) − radius for every member p) and is skipped unopened;
  *  - degenerate similarities (NaN — a zero vector) disable pruning for
  *    the row, falling back to a full scan so the result still equals
  *    the flat argmax (NaN comparisons would otherwise skip every
  *    group while the flat ordering treats NaN as greatest).
  * Returns exactly [[IvfArgmaxFlat]]'s answer (spec-pinned on clustered
  * and uniform-random codebooks) at ~(√k + opened members)·d cost.
  */
case class IvfArgmaxTwo(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_argmax_two"
  // null for empty groups / all-empty member sets (see IvfArgmaxFlat)
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfArgmaxTwo =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  def compute(v: ArrayData, groups: ArrayData): Any = {
    val ng = groups.numElements()
    if (ng == 0) return null
    // pass 1: best group by (ds, gid), Spark double ordering; scores kept
    // for the bound pass so each super-pivot is scored exactly once
    val dss = new Array[Double](ng)
    var bestG = -1; var bestDs = Double.NegativeInfinity; var bestGid = Int.MinValue
    var degenerate = false
    var i = 0
    while (i < ng) {
      val g = groups.getStruct(i, 4)
      val ds = IvfArgmaxKernel.cos(v, g.getArray(1))
      dss(i) = ds
      if (java.lang.Double.isNaN(ds)) degenerate = true
      val gid = g.getInt(0)
      val c = java.lang.Double.compare(ds, bestDs)
      if (c > 0 || (c == 0 && gid > bestGid)) { bestDs = ds; bestGid = gid; bestG = i }
      i += 1
    }
    if (degenerate) {
      // exactness over speed for broken rows: scan every member
      var s = Double.NegativeInfinity; var pid = Long.MinValue
      var any = false
      i = 0
      while (i < ng) {
        val g = groups.getStruct(i, 4)
        if (g.getArray(3).numElements() > 0) any = true
        val r = IvfArgmaxKernel.scanMembers(v, g.getArray(3), s, pid)
        s = r._1; pid = r._2
        i += 1
      }
      return if (any) pid else null
    }
    // incumbent from the best group's members
    val bg = groups.getStruct(bestG, 4)
    var anyMember = bg.getArray(3).numElements() > 0
    var (s0, pid0) = IvfArgmaxKernel.scanMembers(
      v, bg.getArray(3), Double.NegativeInfinity, Long.MinValue)
    // pass 2: open only groups whose bound can reach the incumbent.
    // The bound cos(θ − r) is computed by ANGLE ADDITION —
    // ds·cos r + sqrt(1 − ds²)·sin r — never through acos(ds), which is
    // ill-conditioned near |ds| = 1 (dθ ≈ ε/√(1−ds²) can amplify a
    // 1e-16 dot-product rounding past any fixed slop). Every term here
    // is bounded by 1 and within a few ulp; the sqrt's worst-case
    // cancellation near ds = 1 contributes < ~1e-10 absolute, so the
    // 1e-9 inclusion slop (erring toward opening) genuinely dominates
    // the arithmetic error. θ ≤ r ⟺ ds ≥ cos r (both in [0, π]) → the
    // bound saturates at 1. A NaN incumbent (a degenerate member pivot
    // scanned — NaN is GREATEST in the flat ordering) disables pruning
    // for the rest of the row: every remaining group is opened so the
    // largest-pid NaN pivot wins exactly as it does flat.
    i = 0
    while (i < ng) {
      if (i != bestG) {
        val g = groups.getStruct(i, 4)
        val ds = math.max(-1.0, math.min(1.0, dss(i)))
        val r = g.getDouble(2)
        val cr = math.cos(r)
        val bound =
          if (ds >= cr) 1.0
          else ds * cr + math.sqrt(math.max(0.0, 1.0 - ds * ds)) * math.sin(r)
        if (bound + 1e-9 >= s0 || java.lang.Double.isNaN(s0)) {
          if (g.getArray(3).numElements() > 0) anyMember = true
          val res = IvfArgmaxKernel.scanMembers(v, g.getArray(3), s0, pid0)
          s0 = res._1; pid0 = res._2
        }
      }
      i += 1
    }
    // all-empty member sets → null, matching the flat argmax over an
    // empty pivot array (hierCodebookOf never builds one, but the
    // expression contract shouldn't depend on that)
    if (anyMember) pid0 else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("ivfArgmaxTwo", this, classOf[IvfArgmaxTwo].getName)
      val r = ctx.freshName("r")
      // fresh local: with non-nullable children nullSafeCodeGen emits
      // bodies into a shared flat scope, so sibling/nested natives would
      // collide on a fixed name
      s"""Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }""".stripMargin
    })
}

object IvfArgmaxTwo {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("ivf_argmax_two"),
      new ExpressionInfo(classOf[IvfArgmaxTwo].getName, "ivf_argmax_two"),
      (children: Seq[Expression]) =>
        if (children.size >= 3)
          IvfArgmaxProbes(children(0), children(1), children(2))
        else IvfArgmaxTwo(children(0), children(1))))
}

/** `ivf_argmax_two(v, groups, probes)` — BOUNDED-COST two-level coarse
  * assignment: argmax over the members of the `probes` best-scoring
  * groups only. Guaranteed ~O((√k + probes·k/√k)·d) per vector at the
  * cost of measured (not proven) agreement with the flat argmax — the
  * conf-selected alternative to [[IvfArgmaxTwo]] when ingest throughput
  * must be deterministic.
  *
  * Ordering contract matches the HOF reference
  * (`AnnIndex.assignTwoHofRef`) bit-for-bit: groups sorted by
  * `(0d − cos(v, sp), gid)` ascending under Spark double ordering (NaN
  * sorts LAST, so degenerate super-pivot scores are probed last, exactly
  * as `array_sort` orders them), members argmax on `(s, pid)` with ties
  * to the larger pivot id.
  */
case class IvfArgmaxProbes(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_argmax_two"
  // null for empty groups / non-positive probes (see IvfArgmaxFlat)
  override def nullable: Boolean = true

  // the SQL surface accepts any integral literal (4 parses as INT, 4L as
  // BIGINT); a fractional or non-numeric probes argument is rejected at
  // analysis time instead of a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = third.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_argmax_two probes argument must be integral, got ${t.simpleString}")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IvfArgmaxProbes =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Number].intValue())

  def compute(v: ArrayData, groups: ArrayData, probes: Int): Any = {
    val ng = groups.numElements()
    if (ng == 0 || probes <= 0) return null
    // (ns, gid) per group — the HOF's sort key, verbatim
    val ns = new Array[Double](ng)
    val gid = new Array[Int](ng)
    var i = 0
    while (i < ng) {
      val g = groups.getStruct(i, 4)
      ns(i) = 0.0 - IvfArgmaxKernel.cos(v, g.getArray(1))
      gid(i) = g.getInt(0)
      i += 1
    }
    // top-`take` selection by (ns, gid) ascending — primitive selection
    // scan (take ≈ 4 ≪ ng ≈ √k), zero allocation beyond the two arrays;
    // Double.compare keeps NaN scores LAST, matching array_sort
    var s = Double.NegativeInfinity; var pid = Long.MinValue
    var any = false
    val take = math.min(probes, ng)
    val used = new Array[Boolean](ng)
    var t = 0
    while (t < take) {
      var best = -1
      i = 0
      while (i < ng) {
        if (!used(i)) {
          if (best < 0) best = i
          else {
            val c = java.lang.Double.compare(ns(i), ns(best))
            if (c < 0 || (c == 0 && gid(i) < gid(best))) best = i
          }
        }
        i += 1
      }
      used(best) = true
      val g = groups.getStruct(best, 4)
      if (g.getArray(3).numElements() > 0) any = true
      val r = IvfArgmaxKernel.scanMembers(v, g.getArray(3), s, pid)
      s = r._1; pid = r._2
      t += 1
    }
    if (any) pid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val ref = ctx.addReferenceObj("ivfArgmaxProbes", this, classOf[IvfArgmaxProbes].getName)
      val r = ctx.freshName("r")
      s"""Object $r = $ref.compute($a, $b, (int) $c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }""".stripMargin
    })
}
