package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins `Tables.spread`'s adaptive contract: the scan-spread exists ONLY
  * for under-parallelized input (the single-file local testdata); input
  * that already arrives in >= cores partitions must pass through with NO
  * added exchange — an unconditional round-robin repartition would
  * re-shuffle a whole corpus at scale for parallelism the scan already
  * has (the bug the shuffle audit surfaced in round 10).
  */
class SpreadSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("single-split input is spread to all cores") {
    val docs = Tables.documents(spark, sf) // one local file → 1 split
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val spreadDf = Tables.spread(docs)
    assert(spreadDf.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("pre-split input passes through with zero added shuffle") {
    val par = spark.sparkContext.defaultParallelism
    val dir = tmp("graft_presplit")
    // write >= cores files so the scan naturally parallelizes
    Tables.documents(spark, sf).repartition(par + 2)
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val multi = spark.read.parquet(s"$dir/docs.parquet")
    assume(multi.rdd.getNumPartitions >= par)
    val out = Tables.spread(multi)
    // same frame back: no exchange in the plan at all
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"spread added an exchange to pre-split input:\n$plan")
    assert(out.rdd.getNumPartitions == multi.rdd.getNumPartitions)
  }

  test("a post-exchange frame is rejected at plan time") {
    val docs = Tables.documents(spark, sf)
    // each of these would let the .rdd probe materialize query stages
    val offenders = Seq(
      docs.repartition(4),
      docs.groupBy("lang").count(),
      docs.join(docs.select("doc_id"), "doc_id"),
      docs.orderBy("doc_id"),
      docs.select("lang").distinct())
    offenders.foreach { bad =>
      val e = intercept[IllegalArgumentException](Tables.spread(bad))
      assert(e.getMessage.contains("scan-rooted"), e.getMessage)
    }
    // the allowed shape still passes: scan + filter + projection
    assert(Tables.spread(
      docs.where(col("doc_id") > 0).select("doc_id", "lang")) ne null)
  }
}
