package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{IvfArgmaxFlat, PqAdc, PqEncode, PqReconErr}

/** ScalaCheck properties for the ANN native kernels (PQ encode/ADC/audit
  * + flat IVF argmax) — the [[PropertySpec]] discipline: direct `eval`
  * on the expressions, no Spark jobs, hundreds of random geometries per
  * property in milliseconds. The unit specs (AnnPqSpec, AnnIndexSpec)
  * pin the kernels against HOF/driver references on the REAL corpus and
  * fixed seeds; these properties pin the algebraic contracts — argmin
  * laws, scale invariance, fused-audit == decode-of-encode — over
  * arbitrary (d, m, ksub) geometry, where a hand-picked fixture cannot
  * sweep. Fixed initial seed keeps runs deterministic.
  */
class AnnKernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(100)
        .withInitialSeed(Seed(4242L)),
      p)
    assert(res.passed, s"$name: $res")
  }

  private def darr(xs: Seq[Double]): ArrayData = new GenericArrayData(xs.toArray)

  private val dChild = BoundReference(0, ArrayType(DoubleType), nullable = false)

  private def encode(v: Seq[Double], cbs: Seq[Double], m: Int, ksub: Int): Array[Byte] =
    PqEncode(dChild, dChild, m, ksub).compute(darr(v), darr(cbs))
      .asInstanceOf[Array[Byte]]

  private def reconErr(v: Seq[Double], cbs: Seq[Double], m: Int, ksub: Int): Any =
    PqReconErr(dChild, dChild, m, ksub).compute(darr(v), darr(cbs))

  private def adc(codes: Array[Byte], lut: Seq[Double], ksub: Int): Double =
    PqAdc(dChild, dChild, ksub).compute(codes, darr(lut)).asInstanceOf[Double]

  /** The kernels' exact normalize semantics (PqKernel.normalizedOrNull):
    * sequential square fold, zero-norm vectors pass through raw.
    */
  private def refNormalize(v: Array[Double]): Array[Double] = {
    var nrm = 0.0; var i = 0
    while (i < v.length) { nrm += v(i) * v(i); i += 1 }
    if (nrm > 0.0) {
      val inv = 1.0 / math.sqrt(nrm)
      v.map(_ * inv)
    } else v.clone()
  }

  /** Naive reference argmin per subspace: strict <, lower code on ties —
    * the PqKernel.encodeSub contract, identical fold order.
    */
  private def refEncode(
      vn: Array[Double], cbs: Array[Double], m: Int, ksub: Int): Array[Byte] = {
    val dsub = vn.length / m
    Array.tabulate(m) { j =>
      var best = 0; var bestD = Double.PositiveInfinity
      for (c <- 0 until ksub) {
        var dist = 0.0
        for (t <- 0 until dsub) {
          val diff = vn(j * dsub + t) - cbs((j * ksub + c) * dsub + t)
          dist += diff * diff
        }
        if (dist < bestD) { bestD = dist; best = c }
      }
      best.toByte
    }
  }

  /** Squared L2 error of decoded `codes` against `vn`, subspace-major
    * sequential fold — the decode-of-encode identity [[PqReconErr]]'s
    * fused loop must reproduce.
    */
  private def refDecodeErr(
      vn: Array[Double], cbs: Array[Double], codes: Array[Byte],
      m: Int, ksub: Int): Double = {
    val dsub = vn.length / m
    var err = 0.0
    for (j <- 0 until m) {
      val base = (j * ksub + (codes(j) & 0xFF)) * dsub
      var dist = 0.0
      for (t <- 0 until dsub) {
        val diff = vn(j * dsub + t) - cbs(base + t)
        dist += diff * diff
      }
      err += dist
    }
    err
  }

  /** Random (d, m, ksub, v, cbs) geometry: d ∈ {2,4,6,8,16}, m any
    * divisor, ksub 1..8, finite values including exact zeros and exact
    * duplicates (tie pressure on the argmin).
    */
  private val genGeom: Gen[(Int, Int, Seq[Double], Seq[Double])] = for {
    d <- Gen.oneOf(2, 4, 6, 8, 16)
    m <- Gen.oneOf((1 to d).filter(d % _ == 0))
    ksub <- Gen.choose(1, 8)
    value = Gen.frequency(
      8 -> Gen.choose(-5.0, 5.0),
      1 -> Gen.const(0.0),
      1 -> Gen.const(1.0))
    v <- Gen.listOfN(d, value)
    cbs <- Gen.listOfN(m * ksub * (d / m), value)
  } yield (m, ksub, v, cbs)

  test("pq_encode equals the naive argmin reference on arbitrary geometry") {
    check("encode=ref", Prop.forAll(genGeom) { case (m, ksub, v, cbs) =>
      val vn = refNormalize(v.toArray)
      val got = encode(v, cbs, m, ksub)
      val want = refEncode(vn, cbs.toArray, m, ksub)
      (got.toSeq == want.toSeq) :| s"got ${got.toSeq} want ${want.toSeq}"
    })
  }

  test("pq_encode is scale-invariant: encode(a*v) == encode(v) for a > 0") {
    // exact powers of two scale without rounding, so invariance is
    // bit-for-bit, not approximate
    val genScaled = for {
      g <- genGeom if g._3.exists(_ != 0.0)
      a <- Gen.oneOf(0.25, 0.5, 2.0, 4.0, 1024.0)
    } yield (g, a)
    check("scale-invariant", Prop.forAll(genScaled) { case ((m, ksub, v, cbs), a) =>
      val base = encode(v, cbs, m, ksub)
      val scaled = encode(v.map(_ * a), cbs, m, ksub)
      (base.toSeq == scaled.toSeq) :| s"a=$a: ${base.toSeq} vs ${scaled.toSeq}"
    })
  }

  test("pq_recon_err is the decode-of-encode error — the fused kernel can't drift from the codes") {
    check("fused=decode∘encode", Prop.forAll(genGeom) { case (m, ksub, v, cbs) =>
      val vn = refNormalize(v.toArray)
      val codes = encode(v, cbs, m, ksub)
      val err = reconErr(v, cbs, m, ksub).asInstanceOf[Double]
      val want = refDecodeErr(vn, cbs.toArray, codes, m, ksub)
      (err == want) :| s"fused $err != decoded-codes error $want"
    })
  }

  test("pq_recon_err is zero when the codebook holds the vector's own normalized subvectors") {
    val genExact = for {
      g <- genGeom if g._3.exists(_ != 0.0)
      slot <- Gen.choose(0, g._2 - 1)
    } yield (g, slot)
    check("exact-centroid=0", Prop.forAll(genExact) { case ((m, ksub, v, cbs), slot) =>
      val vn = refNormalize(v.toArray)
      val dsub = v.length / m
      // overwrite centroid `slot` of every subspace with vn's own slice
      val planted = cbs.toArray
      for (j <- 0 until m; t <- 0 until dsub)
        planted((j * ksub + slot) * dsub + t) = vn(j * dsub + t)
      val err = reconErr(v, planted.toSeq, m, ksub).asInstanceOf[Double]
      (err == 0.0) :| s"planted-centroid error $err != 0"
    })
  }

  test("pq_recon_err never increases when a subspace codebook gains a centroid") {
    val genGrown = for {
      g <- genGeom if g._2 < 8
      extra <- Gen.listOfN(g._3.length, Gen.choose(-5.0, 5.0))
    } yield (g, extra)
    check("monotone-in-ksub", Prop.forAll(genGrown) { case ((m, ksub, v, cbs), extra) =>
      val dsub = v.length / m
      // append one fresh centroid at the END of each subspace block:
      // codes stay valid, the argmin domain strictly grows
      val grown = (0 until m).flatMap { j =>
        cbs.slice(j * ksub * dsub, (j + 1) * ksub * dsub) ++
          extra.slice(j * dsub, (j + 1) * dsub)
      }
      val before = reconErr(v, cbs, m, ksub).asInstanceOf[Double]
      val after = reconErr(v, grown, m, ksub + 1).asInstanceOf[Double]
      (after <= before) :| s"error grew: $before -> $after"
    })
  }

  test("pq_adc over encoded codes equals the subspace-major dot with the decoded centroids") {
    val genWithQuery = for {
      g <- genGeom
      q <- Gen.listOfN(g._3.length, Gen.choose(-5.0, 5.0))
    } yield (g, q)
    check("adc=dot∘decode", Prop.forAll(genWithQuery) { case ((m, ksub, v, cbs), q) =>
      val codes = encode(v, cbs, m, ksub)
      val dsub = v.length / m
      val qn = refNormalize(q.toArray)
      // reference lut in the PqIndex.lut layout/fold: lut[j][c] =
      // dot(qn subvector j, centroid (j, c)), sequential over t
      val lut = (0 until m).flatMap { j =>
        (0 until ksub).map { c =>
          var s = 0.0
          for (t <- 0 until dsub) s += qn(j * dsub + t) * cbs((j * ksub + c) * dsub + t)
          s
        }
      }
      val got = adc(codes, lut, ksub)
      // same sum in the same j-order, straight from the decoded centroids
      var want = 0.0
      for (j <- 0 until m) {
        val base = (j * ksub + (codes(j) & 0xFF)) * dsub
        var s = 0.0
        for (t <- 0 until dsub) s += qn(j * dsub + t) * cbs(base + t)
        want += s
      }
      (got == want) :| s"adc $got != decoded dot $want"
    })
  }

  test("non-finite vectors: encode stays total and deterministic, recon_err refuses to price") {
    val genBad = for {
      g <- genGeom
      pos <- Gen.choose(0, g._3.length - 1)
      bad <- Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    } yield (g, pos, bad)
    check("non-finite", Prop.forAll(genBad) { case ((m, ksub, v, cbs), pos, bad) =>
      val poisoned = v.updated(pos, bad)
      val c1 = encode(poisoned, cbs, m, ksub)
      val c2 = encode(poisoned, cbs, m, ksub)
      val err = reconErr(poisoned, cbs, m, ksub)
      ((c1.length == m && c1.toSeq == c2.toSeq) :| "encode must stay total+deterministic") &&
        ((err == null) :| s"unpriceable vector must audit as null, got $err")
    })
  }

  test("empty vectors are null through every kernel") {
    assert(encode(Nil, Nil, 2, 4) == null)
    assert(reconErr(Nil, Nil, 2, 4) == null)
    assert(PqAdc(dChild, dChild, 4).compute(Array.emptyByteArray, darr(Nil)) == null)
  }

  private def pivotRow(pid: Long, pv: Seq[Double]): GenericInternalRow =
    new GenericInternalRow(Array[Any](pid, new GenericArrayData(pv.toArray)))

  private def argmaxFlat(v: Seq[Double], pvs: Seq[(Long, Seq[Double])]): Any =
    IvfArgmaxFlat(dChild, dChild).compute(
      darr(v), new GenericArrayData(pvs.map { case (p, x) => pivotRow(p, x) }.toArray))

  /** The kernel's ordering contract: Spark double ordering (NaN
    * greatest via java.lang.Double.compare), similarity ties break to
    * the LARGER pivot id.
    */
  private def refArgmax(v: Array[Double], pvs: Seq[(Long, Seq[Double])]): Long = {
    def cos(y: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- 0 until math.min(v.length, y.length)) {
        dot += v(i) * y(i); nx += v(i) * v(i); ny += y(i) * y(i)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    pvs.map { case (pid, pv) => (cos(pv.toArray), pid) }
      .reduceLeft { (a, b) =>
        val c = java.lang.Double.compare(b._1, a._1)
        if (c > 0 || (c == 0 && b._2 > a._2)) b else a
      }._2
  }

  test("ivf_argmax equals the (sim, pid) max reference, including zero-norm NaN pivots") {
    val genPvs = for {
      d <- Gen.oneOf(2, 4, 8)
      n <- Gen.choose(1, 20)
      value = Gen.frequency(8 -> Gen.choose(-3.0, 3.0), 1 -> Gen.const(0.0))
      v <- Gen.listOfN(d, value)
      pvs <- Gen.listOfN(n, for {
        pid <- Gen.choose(0L, 40L) // small id space forces duplicate-sim ties
        pv <- Gen.frequency(
          6 -> Gen.listOfN(d, value),
          1 -> Gen.const(List.fill(d)(0.0))) // zero-norm pivot → NaN sim
      } yield (pid, pv: Seq[Double]))
    } yield (v, pvs)
    check("argmax=ref", Prop.forAll(genPvs) { case (v, pvs) =>
      val got = argmaxFlat(v, pvs)
      val want = refArgmax(v.toArray, pvs)
      (got == want) :| s"got $got want $want over ${pvs.map(_._1)}"
    })
  }

  test("ivf_argmax is invariant under pivot order permutation") {
    val genPerm = for {
      d <- Gen.oneOf(2, 4, 8)
      n <- Gen.choose(2, 12)
      v <- Gen.listOfN(d, Gen.choose(-3.0, 3.0))
      pvs <- Gen.listOfN(n, for {
        pid <- Gen.choose(0L, 1000L)
        pv <- Gen.listOfN(d, Gen.choose(-3.0, 3.0))
      } yield (pid, pv: Seq[Double]))
      shuffled <- Gen.const(new scala.util.Random(pvs.hashCode.toLong).shuffle(pvs))
    } yield (v, pvs, shuffled)
    check("order-invariant", Prop.forAll(genPerm) { case (v, pvs, shuffled) =>
      (argmaxFlat(v, pvs) == argmaxFlat(v, shuffled)) :|
        s"${argmaxFlat(v, pvs)} vs ${argmaxFlat(v, shuffled)} after shuffle"
    })
  }

  test("ivf_argmax: appending a strictly closer pivot wins, a farther one never does") {
    val genExtend = for {
      d <- Gen.oneOf(2, 4, 8)
      n <- Gen.choose(1, 10)
      v <- Gen.listOfN(d, Gen.choose(-3.0, 3.0)) if v.exists(_ != 0.0)
      pvs <- Gen.listOfN(n, for {
        pid <- Gen.choose(0L, 100L)
        pv <- Gen.listOfN(d, Gen.choose(-3.0, 3.0)) if pv.exists(_ != 0.0)
      } yield (pid, pv: Seq[Double]))
    } yield (v, pvs)
    check("extension-law", Prop.forAll(genExtend) { case (v, pvs) =>
      // the vector ITSELF has cosine exactly 1.0 — with a fresh max pid
      // it wins every tie by the larger-pid rule
      val selfPid = pvs.map(_._1).max + 1
      val withSelf = argmaxFlat(v, pvs :+ (selfPid -> v))
      // the NEGATED vector has cosine -1.0 — it can only win if every
      // existing pivot also scores -1.0 AND its pid is larger; give it
      // a smaller-than-all pid so it must never win
      val loserPid = pvs.map(_._1).min - 1
      val withLoser = argmaxFlat(v, (loserPid -> v.map(-_): (Long, Seq[Double])) +: pvs)
      ((withSelf == selfPid) :| s"self pivot lost: $withSelf != $selfPid") &&
        ((withLoser == argmaxFlat(v, pvs)) :| "antipodal pivot changed the winner")
    })
  }

  test("cosine_sim_q8: bit-identical to dequantize-then-cosine over arbitrary codes") {
    import graft.plans.{CosineSim, CosineSimQ8}
    import org.apache.spark.sql.types.ByteType
    val bChild = BoundReference(0, ArrayType(ByteType), nullable = false)
    val genCase = for {
      d <- Gen.choose(1, 96)
      codes <- Gen.listOfN(d, Gen.choose(-127, 127).map(_.toByte))
      scale <- Gen.oneOf(Gen.choose(1e-6, 10.0), Gen.const(1.0))
      q <- Gen.listOfN(d, Gen.choose(-3.0, 3.0))
    } yield (codes, scale, q)
    check("q8=hof", Prop.forAll(genCase) { case (codes, scale, q) =>
      val fused = CosineSimQ8(bChild, dChild, dChild).compute(
        new GenericArrayData(codes.toArray), scale, darr(q))
      val deq = codes.map(_.toDouble * scale)
      val ref = CosineSim(dChild, dChild).compute(darr(deq), darr(q))
      (java.lang.Double.doubleToLongBits(fused) ==
        java.lang.Double.doubleToLongBits(ref)) :| s"$fused != $ref"
    })
    // length mismatch folds over min(n) on both forms; zero vectors are
    // NaN on both (0/0) — covered by the generator when q is all-zero?
    // pin the edge explicitly instead of relying on generator luck
    val z = CosineSimQ8(bChild, dChild, dChild).compute(
      new GenericArrayData(Array[Byte](0, 0)), 1.0, darr(Seq(1.0, 2.0)))
    assert(z.isNaN, "all-zero codes must score NaN (0/0), as the HOF form does")
  }
}
