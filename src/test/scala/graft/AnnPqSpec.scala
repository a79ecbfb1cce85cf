package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, PqIndex, Similarity}

/** Product-quantization serving tier: codebook determinism, the native
  * kernels' contracts, and the recall property that makes the
  * exact-re-rank output equal the oracle-checked exact top-k.
  */
class AnnPqSpec extends SparkSpec {

  test("store holds one m-byte code per corpus vector") {
    val ver = AnnIndex.corpusVersion(spark, sf)
    val store = PqIndex.store(spark, sf, ver)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(store.count() == n)
    val lens = store.select(length(col("codes"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(PqIndex.M),
      s"every code must be exactly ${PqIndex.M} bytes, got lengths $lens")
  }

  test("codebook training is deterministic and shaped [m][ksub][dsub]") {
    val rnd = new scala.util.Random(83)
    val sample = Array.fill(500)(Array.fill(64)(rnd.nextGaussian()))
    val a = PqIndex.train(sample.map(_.clone()))
    val b = PqIndex.train(sample.map(_.clone()))
    assert(a.length == PqIndex.M * PqIndex.Ksub * (64 / PqIndex.M))
    assert(java.util.Arrays.equals(a, b),
      "two trainings of the same sample must be bit-identical")
  }

  test("native pq_adc equals a driver-side recompute of the table sum") {
    val ver = AnnIndex.corpusVersion(spark, sf)
    val cbs = PqIndex.codebooks(spark, sf, ver)
    val qv = graft.sources.Tables.embeddings(spark, sf)
      .where(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val lut = PqIndex.lut(qv, cbs)
    import spark.implicits._
    val lutDf = Seq(Tuple1(lut.toSeq)).toDF("lut")
    val rows = PqIndex.store(spark, sf, ver)
      .crossJoin(broadcast(lutDf))
      .select(col("vec_id"), col("codes"),
        expr(s"pq_adc(codes, lut, ${PqIndex.Ksub})").as("adc"))
      .orderBy("vec_id").limit(20).collect()
    for (r <- rows) {
      val codes = r.getAs[Array[Byte]]("codes")
      val expected = codes.zipWithIndex
        .map { case (c, j) => lut(j * PqIndex.Ksub + (c & 0xFF)) }.sum
      assert(r.getDouble(2) == expected,
        s"vec ${r.getLong(0)}: native adc ${r.getDouble(2)} != $expected")
    }
  }

  test("served output equals simTopK at the small SF (recall holds at the default pool)") {
    // at 500 uniform-random vectors every exact-top-10 neighbor sits
    // inside ADC rank ≤ ~87 (DevPqRecall) — 4× inside the default pool,
    // so the exact re-rank reproduces the exact answer here. At larger
    // n on RANDOM data cosine gaps shrink toward quantization noise and
    // equality honestly degrades to the recall floors below.
    val exact = Similarity.simTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val served = Similarity.simAnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq == exact.toSeq,
      "PQ retrieve + exact re-rank must reproduce the exact top-10 at this corpus size")
  }

  test("per-query recall floors over the batch-query set at the default pool") {
    val ver = AnnIndex.corpusVersion(spark, sf)
    val cbs = PqIndex.codebooks(spark, sf, ver)
    val pool = PqIndex.rerank(spark)
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val recalls = (0L until Similarity.BatchQueries.toLong).map { qid =>
      val qv = emb.where(col("vec_id") === qid).head().getSeq[Double](1).toArray
      val lutDf = Seq(Tuple1(PqIndex.lut(qv, cbs).toSeq)).toDF("lut")
      val adcTop = PqIndex.store(spark, sf, ver)
        .where(col("vec_id") =!= qid)
        .crossJoin(broadcast(lutDf))
        .select(col("vec_id"), expr(s"pq_adc(codes, lut, ${PqIndex.Ksub})").as("adc"))
        .orderBy(desc("adc"), asc("vec_id")).limit(pool)
        .collect().map(_.getLong(0)).toSet
      val q = emb.where(col("vec_id") === qid).select(col("v").as("qv"))
      val exactTop = emb.where(col("vec_id") =!= qid)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(expr("cosine_sim(v, qv)"), 6).as("sim"))
        .orderBy(desc("sim"), asc("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      (exactTop & adcTop).size.toDouble / exactTop.size
    }
    // uniform-random vectors are the PQ worst case; floors are set with
    // regen margin (measured 1.0 per query at this corpus size)
    assert(recalls.min >= 0.7,
      s"a batch query fell below the 0.7 recall floor: $recalls")
    assert(recalls.sum / recalls.size >= 0.9,
      s"average recall@10 below 0.9: $recalls")
  }

  test("ivfpq store: one dir per cell, m-byte codes, cells identical to the ivf store") {
    val ver = AnnIndex.corpusVersion(spark, sf)
    val path = AnnIndex.ensureIvfPq(spark, sf, ver)
    val dirs = new java.io.File(path.stripPrefix("file:")).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.nonEmpty, s"expected cluster= partition dirs under $path")
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val joined = AnnIndex.ivfPq(spark, sf, ver).as("pq")
      .join(AnnIndex.ivf(spark, sf, ver).as("iv"), "vec_id")
      .select(col("pq.cluster"), col("iv.cluster"), length(col("codes")))
      .collect()
    // row-for-row: same corpus coverage, same coarse cells (one
    // coarseAssign dispatch + shared version identity), m-byte codes
    assert(joined.length == n)
    joined.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        "ivfpq cells must equal the ivf assignment")
      assert(r.getInt(2) == PqIndex.M)
    }
  }

  test("ivfpq candidates come only from probed cells; output equals simAnnIvf here") {
    val ver = AnnIndex.corpusVersion(spark, sf)
    val nprobe = AnnIndex.probeCount(AnnIndex.centroids(spark, sf, ver).size)
    val qv = graft.sources.Tables.embeddings(spark, sf)
      .where(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    // probed cells recomputed driver-side from the same cached pivots
    val probed = AnnIndex.centroids(spark, sf, ver).zipWithIndex
      .map { case (pv, i) =>
        val dot = pv.zip(qv).map { case (a, b) => a * b }.sum
        val na = math.sqrt(pv.map(x => x * x).sum)
        val nb = math.sqrt(qv.map(x => x * x).sum)
        (i, dot / (na * nb)) }
      .sortBy { case (i, s) => (-s, i) }.take(nprobe).map(_._1).toSet
    val cells = AnnIndex.ivfPq(spark, sf, ver)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val served = Similarity.simAnnIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.forall { case (id, _) => probed.contains(cells(id)) },
      s"a served id came from an unprobed cell: $served / probed $probed")
    // at this corpus size the ADC pool covers the probed rows' true order,
    // so the PQ layer loses NOTHING beyond the cell-probe choice — the
    // composition equals its IVF parent exactly (measured identical at
    // sf0.001/0.01/0.1; at real scale this honestly degrades into the
    // pqRerank recall trade, which the pq-tier floors above price)
    val ivf = Similarity.simAnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq == ivf.toSeq,
      "IVF-PQ must equal the uncompressed IVF probe at this corpus size")
  }

  test("batched IVF-PQ equals the uncompressed batched IVF probe at this corpus size") {
    // same invariant as the single-query tier: while the per-qid ADC
    // pool covers the probed rows, the PQ layer loses nothing beyond
    // the cell-probe choice — measured identical (qid, vec_id, sim)
    // tuples at sf0.001/0.01/0.1
    val ivf = Similarity.simAnnBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pq = Similarity.simAnnIvfPqBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pq == ivf,
      "batched IVF-PQ must reproduce the batched IVF probe here")
  }

  test("driver probe scoring is bit-exact with native cosine_sim, NaN ordering included") {
    import spark.implicits._
    // includes a ZERO-NORM vector: the native scores it NaN (sorts
    // GREATEST under desc), and the driver replica must agree — the
    // clamped cosArr would score it 0.0 and silently probe a different
    // cell set than simAnnIvf on a corpus that seeds a degenerate pivot
    val rnd = new scala.util.Random(91)
    val vecs = Seq.fill(20)(Array.fill(8)(rnd.nextGaussian())) :+
      Array.fill(8)(0.0)
    val q = Array.fill(8)(rnd.nextGaussian())
    val native = vecs.zipWithIndex
      .map { case (v, i) => (i, v.toSeq, q.toSeq) }
      .toDF("id", "v", "qv")
      .select(col("id"), expr("cosine_sim(v, qv)").as("s"))
    val rows = native.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for ((v, i) <- vecs.zipWithIndex) {
      val driver = AnnIndex.cosRawArr(q, v)
      assert(java.lang.Double.doubleToRawLongBits(driver) ==
        java.lang.Double.doubleToRawLongBits(rows(i)),
        s"vec $i: driver $driver != native ${rows(i)} (bitwise)")
    }
    // and the full ordering replica: Spark (desc s, asc id) ==
    // the production sort (IEEE total order reversed, then id)
    val sparkOrder = native.orderBy(desc("s"), asc("id"))
      .collect().map(_.getInt(0)).toSeq
    val driverOrder = vecs.zipWithIndex
      .map { case (v, i) => (i, AnnIndex.cosRawArr(q, v)) }
      .sortBy { case (i, s) => (s, i) }(Ordering.Tuple2(
        Ordering.Double.TotalOrdering.reverse, Ordering.Int))
      .map(_._1)
    assert(driverOrder == sparkOrder,
      "driver probe ordering must replicate Spark's desc-with-NaN-greatest")
  }

  test("pq_adc refuses codes built under a wider geometry instead of mis-scoring") {
    val e = intercept[Exception] {
      // subspace-1 value 0.8 encodes to code 1 (centroids [0.0],[0.8]);
      // scoring that code against ksub=1 would silently read the next
      // subspace's table entry without the check
      spark.range(1).selectExpr(
        "pq_adc(pq_encode(array(3d, 4d), array(0.6d, 0.0d, 0.0d, 0.8d), 2, 2), " +
          "array(0.25d, 0.75d), 1)").collect()
    }
    assert(e.getMessage != null)
  }

  test("a miswired codebook fails loudly instead of mis-encoding") {
    val e = intercept[Exception] {
      spark.range(1).selectExpr(
        "pq_encode(array(1d, 2d), array(1d, 2d, 3d), 2, 256)").collect()
    }
    assert(e.getMessage != null)
  }

  test("quantizePq card: native recon error equals a driver recompute; sane bounds") {
    import spark.implicits._
    val ver = AnnIndex.corpusVersion(spark, sf)
    val cbs = PqIndex.codebooks(spark, sf, ver)
    val dsub = 64 / PqIndex.M
    // driver recompute of the fused kernel on a sample of rows
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.nonEmpty,
      "fixture ids drifted: vec_id < 10 matched nothing, the equality loop would be vacuous")
    val cbDf = Seq(Tuple1(cbs.toSeq)).toDF("cbs")
    val native = graft.sources.Tables.embeddings(spark, sf)
      .where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(cbDf))
      .select(col("vec_id"), expr(
        s"pq_recon_err(v, cbs, ${PqIndex.M}, ${PqIndex.Ksub})").as("err"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, v) <- rows) {
      val vn = PqIndex.normalize(v)
      val expected = (0 until PqIndex.M).map { j =>
        (0 until PqIndex.Ksub).map { c =>
          val base = (j * PqIndex.Ksub + c) * dsub
          (0 until dsub).map { t =>
            val diff = vn(j * dsub + t) - cbs(base + t); diff * diff }.sum
        }.min
      }.sum
      assert(native(id) == expected, s"vec $id: ${native(id)} != $expected")
      // measured ~0.1–0.4 on this corpus; 4.0 is a ×10-class regression
      // bound (the theoretical worst case is 4m — unit subspace norms
      // both sides — so this is empirical-with-margin, not a law)
      assert(native(id) >= 0.0 && native(id) <= 4.0,
        s"reconstruction error out of the regression bound: ${native(id)}")
    }
    // a vector whose subvectors ARE centroids reconstructs exactly
    val zeroErr = spark.sql(
      "SELECT pq_recon_err(array(0.6d, 0.8d), array(0.6d, 0.8d, 0.0d, 1.0d), 1, 2)")
      .head().getDouble(0)
    assert(zeroErr == 0.0, s"exact-centroid vector must have zero error, got $zeroErr")
    // a non-finite vector is UNPRICEABLE → null (never an Infinity a
    // decimal aggregation would silently drop from the card's avg while
    // still counting the row in the divisor)
    Seq("cast('NaN' AS double), 0.8d", "cast('Infinity' AS double), 0.8d").foreach { bad =>
      val r = spark.sql(
        s"SELECT pq_recon_err(array($bad), array(0.6d, 0.8d, 0.0d, 1.0d), 1, 2)").head()
      assert(r.isNullAt(0), s"non-finite vector ($bad) must price as null")
    }
    // and the card itself: one row per label, errors within the bound,
    // zero unpriceable rows on the real corpus
    val card = Similarity.quantizePq(spark, sf).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0)
      assert(r.getAs[Long]("n_bad") == 0L,
        s"label ${r.get(0)}: ${r.getAs[Long]("n_bad")} unpriceable embeddings in a clean corpus")
      val avg = r.getAs[Double]("avg_rel_err")
      val mx = r.getAs[Double]("max_rel_err")
      assert(avg >= 0.0 && avg <= mx && mx <= 2.0,
        s"label ${r.get(0)}: avg $avg max $mx")
    }
  }

  test("pq kernels stay codegen-compilable with non-nullable children") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // m=2 one-centroid-per-subspace toy: codes must be [0, 0] and the
      // ADC sum the two table entries; id makes the children non-nullable
      // AND non-foldable so the expressions really run inside codegen
      val r = spark.range(1).selectExpr(
        s"""pq_adc(
           |  pq_encode(array(cast(id AS double) + 3d, 4d), array(0.6d, 0.8d), 2, 1),
           |  array(0.25d, 0.75d), 1) AS s""".stripMargin)
        .head.getDouble(0)
      assert(r == 1.0)
      // the fused audit kernel shares the doGenCode pattern (manual
      // `isNull = true` under nullSafeCodeGen) — pin it under the same
      // non-nullable-children regime or a nullability refactor would
      // generate `false = true;` and only this kernel would miss it
      val e = spark.range(1).selectExpr(
        "pq_recon_err(array(cast(id AS double) + 0.6d, 0.8d), array(0.6d, 0.8d, 0.0d, 1.0d), 1, 2) AS e")
        .head.getDouble(0)
      assert(e == 0.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
