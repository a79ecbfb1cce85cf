package graft

import org.apache.spark.sql.functions._

/** The native decimal folds (plans/DecimalFolds) must be bit-for-bit
  * equal to the higher-order `aggregate(..., cast(decimal(28,12)))` forms
  * they replace — the embed-family oracles hash the 6th decimal of these
  * sums, so "close" is not equal. Compared on deterministic pseudo-random
  * vectors spanning sign changes, tiny magnitudes (sub-rounding), and
  * exact-tie .5 rounding boundaries at scale 12.
  */
class DecimalFoldSpec extends SparkSpec {
  import spark.implicits._

  private val dec = "decimal(28,12)"

  private def vectors: Seq[(Long, Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(7L)
    (0L until 64L).map { i =>
      val n = 1 + rnd.nextInt(96)
      def vec = Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3))
      // exact scale-12 ties land on the HALF_UP boundary in both paths
      val tied = vec.updated(0, 0.0000000000005)
      (i, tied, vec)
    }
  }

  test("dsum12 equals the aggregate(cast(dec)) fold bit-for-bit") {
    val df = vectors.map { case (i, a, _) => (i, a) }.toDF("id", "v")
    val rows = df.select(
        col("id"),
        call_function("dsum12", col("v")).as("native"),
        aggregate(col("v"), lit(0).cast(dec),
          (acc, x) => (acc + x.cast(dec)).cast(dec)).cast("double").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
    assert(rows.length == 64)
  }

  test("sq_dist_sum12 equals the zip_with+aggregate fold bit-for-bit") {
    val df = vectors
      .map { case (i, a, b) => (i, a, a.zip(b).map(_._2).take(a.length).padTo(a.length, 0.1)) }
      .toDF("id", "v", "c")
    val rows = df.select(
        col("id"),
        call_function("sq_dist_sum12", col("v"), col("c")).as("native"),
        aggregate(
          zip_with(col("v"), col("c"), (x, m) => (x - m) * (x - m)),
          lit(0).cast(dec),
          (acc, t) => (acc + t.cast(dec)).cast(dec)).cast("double").as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
  }

  test("dsum12 is order-insensitive — the property the oracle match rests on") {
    // DuckDB's SUM over unnested rows has no deterministic order; the
    // engines agree because each term rounds to scale 12 BEFORE an exact
    // sum. Permuting the array must therefore never move any bit.
    val rnd = new scala.util.Random(11L)
    val base = Seq.fill(80)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4))
    val perms = (0 until 8).map(i => new scala.util.Random(i).shuffle(base))
    val rows = perms.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "v")
      .select(call_function("dsum12", col("v")).as("s"))
      .collect().map(r => java.lang.Double.doubleToLongBits(r.getDouble(0)))
    assert(rows.distinct.length == 1,
      s"permutations produced ${rows.distinct.length} distinct bit patterns")
  }

  test("the folds keep their stage in whole-stage codegen") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.Similarity.embedOutliers(spark, sf)
        .queryExecution.executedPlan.toString
      // the *(N) marker must wrap the distance projection — CodegenFallback
      // would leave the sq_dist_sum12 line unstarred (the ContractSpec
      // cosine_sim discipline)
      assert(plan.linesIterator.exists(l =>
        l.contains("sq_dist_sum12") && l.trim.matches("""[+:-]*\s*\*\(\d+\).*""")),
        s"distance projection not in a codegen stage:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("null element and length mismatch null the result, like the HOF form") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0))
    ).toDF("id", "v", "c")
    val rows = df.select(
        col("id"),
        call_function("dsum12", col("v")).as("ns"),
        call_function("sq_dist_sum12", col("v"), col("c")).as("nd"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "null element must null dsum12")
    assert(rows(0).isNullAt(2), "null element must null sq_dist_sum12")
    assert(rows(1).isNullAt(2), "length mismatch must null sq_dist_sum12")
  }

  test("decimal(28,12) overflow and NaN/Infinity null like the HOF chain (pinned)") {
    // the r12 advisory: the old native fold returned a finite double past
    // the decimal(28,12) bound (~1e16) where the HOF's per-step cast
    // nulls in non-ANSI mode — a silent divergence for pathological
    // magnitudes. The chosen behavior is now HOF-parity: null.
    val df = Seq(
      (1L, Seq(1e16, 1.0)),                 // term overflows on its own
      (2L, Seq(6e15, 6e15)),                // accumulator crosses the bound
      (3L, Seq(9e15, 2e15, -9e15)),         // crosses (1.1e16) and comes
                                            // back: nulls at the crossing
                                            // step, not the final value
      (4L, Seq(Double.NaN, 1.0)),
      (5L, Seq(Double.PositiveInfinity)),
      (6L, Seq(9.9e15, -1e15))              // near-bound but legal: finite
    ).toDF("id", "v")
    // the HOF comparison needs non-ANSI (under ANSI — the session
    // default — the cast THROWS on overflow; the native folds choose the
    // non-ANSI null, documented in DecimalFolds)
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = df.select(
          col("id"),
          call_function("dsum12", col("v")).as("native"),
          aggregate(col("v"), lit(0).cast(dec),
            (acc, x) => (acc + x.cast(dec)).cast(dec)).cast("double").as("hof"))
        .orderBy("id").collect()
      rows.foreach { r =>
        val id = r.getLong(0)
        assert(r.isNullAt(1) == r.isNullAt(2),
          s"id=$id: native null=${r.isNullAt(1)} must match hof null=${r.isNullAt(2)}")
        if (!r.isNullAt(1))
          assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=$id value")
      }
      assert(rows.take(5).forall(_.isNullAt(1)), "ids 1-5 overflow/NaN → null")
      assert(!rows(5).isNullAt(1), "id 6 stays finite")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
