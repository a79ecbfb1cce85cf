package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAggs
import graft.operators.{Sampling, Tracking}
import graft.sources.Tables

class SamplingAggSpec extends SparkSpec {

  test("hashSample is deterministic, partition-independent, ~right-sized") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs, "doc_id", 0.3, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    val frac = a.length.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"~30% expected, got $frac")
  }

  test("balanceStrata caps every language at the smallest one") {
    val balanced = Sampling.sampleDocuments(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val floor = Tables.documents(spark, sf).groupBy("lang").count()
      .agg(min("count")).head().getLong(0)
    assert(balanced.values.forall(_ == floor))
    assert(balanced.keySet == Set("de", "en", "es", "fr", "zh"))
  }

  test("stratifiedSample applies per-stratum fractions") {
    val docs = Tables.documents(spark, sf)
    val sampled = Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.2), seed = 11)
    val en = sampled.where(col("lang") === "en").count().toDouble /
      docs.where(col("lang") === "en").count()
    val others = sampled.where(col("lang") =!= "en").count()
    assert(en > 0.05 && en < 0.4, s"en ~20% expected, got $en")
    assert(others == docs.where(col("lang") =!= "en").count(),
      "unlisted strata keep all rows")
  }

  test("approx_count_distinct lands within the HLL error bound") {
    val rows = Tracking.approxDistinct(spark, sf).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("typed Welford aggregator matches var_pop/avg under any split") {
    import spark.implicits._
    val values = Tables.events(spark, sf).select("value").as[Double]
    val m = values.select(TypedAggs.moments.toColumn).head()
    val ref = Tables.events(spark, sf)
      .agg(avg("value"), var_pop("value"), count(lit(1))).head()
    assert(m.n == ref.getLong(2))
    assert(math.abs(m.mean - ref.getDouble(0)) < 1e-9)
    assert(math.abs(m.variance - ref.getDouble(1)) / ref.getDouble(1) < 1e-9)
    // partition-count invariance
    val m2 = Tables.events(spark, sf).repartition(13).select("value").as[Double]
      .select(TypedAggs.moments.toColumn).head()
    assert(m2.n == m.n && math.abs(m2.variance - m.variance) < 1e-6)
  }
}
