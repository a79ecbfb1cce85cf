package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the operator library — the
  * runnable proof that the curation stages compose: one command takes the
  * raw corpus through profile → per-doc verdicts → near-dup dedup →
  * benchmark decontamination → LM-percentile filter → mixture
  * re-weighting → split assignment → shard layout, printing each stage's
  * card and writing the final training shards.
  *
  * Every stage is an existing `SparkEntry` operator (each independently
  * oracle- or spec-verified); this main only sequences them the way a
  * production pipeline would, with the kept-set filters composed as
  * semi-/anti-joins on doc ids — key-only frames, so the chain adds no
  * payload shuffles beyond the stages themselves.
  *
  * Usage: runMain graft.PipelineDemo [sfDir] [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val spark = GraftSession.create()
    import graft.operators._

    def banner(s: String): Unit = println(s"\n=== $s")

    banner(s"corpus profile ($sfDir)")
    TextAnalysis.textStats(spark, sfDir).show(10, truncate = false)

    banner("mixture card (lang x source, token shares)")
    TextAnalysis.corpusMix(spark, sfDir).show(5, truncate = false)

    banner("per-doc verdicts: quality + repetition + length floor")
    val verdicts = TextAnalysis.corpusFilter(spark, sfDir)
    val kept = verdicts.where(col("keep")).select("doc_id")
    verdicts.groupBy("keep").count().show()

    banner("near-dup clusters: keep one representative per cluster")
    val dedupKeep = Dedup.dedupKeep(spark, sfDir)
    dedupKeep.show(10, truncate = false)

    banner("benchmark decontamination (13-gram overlap with eval slice)")
    val contaminated = TextAnalysis.decontaminate(spark, sfDir)
      .select(col("doc_id")).distinct()
    println(s"contaminated docs dropped: ${contaminated.count()}")

    banner("LM-percentile split (CCNet head/middle/tail)")
    TextAnalysis.lmFilter(spark, sfDir).show(15, truncate = false)

    banner("mixture re-weighting (md5 verdict, audit card)")
    Sampling.mixSample(spark, sfDir).show(10, truncate = false)

    // compose the kept set: verdict-kept MINUS contaminated, as key-only
    // joins — the payload joins back exactly once, at the shard write
    val keptIds = kept
      .join(contaminated, Seq("doc_id"), "left_anti")
    val corpus = sources.Tables.documents(spark, sfDir)
      .join(keptIds, Seq("doc_id"))

    banner("split assignment over the curated corpus")
    Sampling.splitAssign(spark, sfDir).show()

    banner(s"shard layout -> $outDir/shards")
    Sampling.writeTrainingShards(corpus, "doc_id", s"$outDir/shards")
    val shards = spark.read.parquet(s"$outDir/shards")
    shards.groupBy("shard").count().orderBy("shard").show()
    println(s"curated ${corpus.count()} of " +
      s"${sources.Tables.documents(spark, sfDir).count()} docs into " +
      s"${shards.select("shard").distinct().count()} shards at $outDir/shards")

    spark.stop()
  }
}
