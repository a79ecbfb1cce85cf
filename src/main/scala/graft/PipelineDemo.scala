package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the operator library — the
  * runnable proof that the curation stages compose: one command takes the
  * raw corpus through profile → per-doc verdicts → near-dup keep-one →
  * benchmark decontamination → LM-tail drop → mixture re-weighting →
  * split assignment → shard layout, printing each stage's card and
  * writing the final training shards.
  *
  * Every stage is an existing operator (each independently oracle- or
  * spec-verified); this main sequences them the way a production pipeline
  * would, and every stage's verdict ACTUALLY GATES the written shards:
  * the kept set is the intersection of the verdict-kept, dedup-
  * representative, mixture-kept ids minus the contaminated and LM-tail
  * ids — all key-only frames, so the chain adds no payload shuffles
  * beyond the stages themselves (the text joins back once, at the shard
  * write).
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
    verdicts.groupBy("keep").count().show()
    val verdictKept = verdicts.where(col("keep")).select("doc_id")

    banner("near-dup clusters: keep one representative per cluster")
    Dedup.dedupKeep(spark, sfDir).show(10, truncate = false)
    val dedupReps = Dedup.nearDupLabels(spark, sfDir)
      .where(col("doc_id") === col("label")).select("doc_id")

    banner("benchmark decontamination (13-gram overlap with eval slice)")
    // the FULL contaminated id set — decontaminate() is the top-20 audit
    // card; dropping from the card would silently truncate the removal.
    // localCheckpoint: the 13-gram explode over the corpus is the most
    // expensive stage here and three consumers read its result (the count
    // below, the split card, the shard write) — materialize the id-only
    // outcome once instead of re-running the scan per consumer
    val contaminated = TextAnalysis.contaminatedIds(spark, sfDir)
      .localCheckpoint(true)
    println(s"contaminated docs dropped: ${contaminated.count()}")

    banner("LM split (CCNet: keep head+middle, drop tail)")
    TextAnalysis.lmFilter(spark, sfDir).show(15, truncate = false)
    val lmTail = TextAnalysis.lmBucketed(spark, sfDir)
      .where(col("bucket") === "tail").select("doc_id")

    banner("mixture re-weighting (md5 verdict, audit card)")
    Sampling.mixSample(spark, sfDir).show(10, truncate = false)

    banner("domain capping (per-source quality-ranked cap, audit card)")
    // RefinedWeb order: filter -> dedup -> cap. The cap ranks the
    // verdict-kept corpus (a superset of the composed set below), so
    // semi-joining its survivors can only shrink a source further —
    // never re-admit a doc another gate dropped
    Sampling.domainCap(spark, sfDir).show(10, truncate = false)
    val capKept = Sampling.domainCapKeep(spark, sfDir)

    // compose the kept set — key-only joins; every stage above gates here.
    // localCheckpoint the composed id set: both downstream consumers (the
    // split card and the shard write) would otherwise re-run every
    // verdict/dedup/decontamination scan above per evaluation — the
    // materialized frame is ids only, so the payload discipline holds
    val keptIds = verdictKept
      .join(dedupReps, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(lmTail, Seq("doc_id"), "left_anti")
      .join(capKept, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val corpus = sources.Tables.documents(spark, sfDir)
      .where(Sampling.mixKeep)
      .join(keptIds, Seq("doc_id"), "left_semi")

    banner("split assignment over the CURATED corpus")
    corpus.withColumn("split", Sampling.splitOf)
      .groupBy("split").count().orderBy("split").show()

    banner(s"shard layout -> $outDir/shards")
    Sampling.writeTrainingShards(corpus, "doc_id", s"$outDir/shards")
    val shards = spark.read.parquet(s"$outDir/shards")
    shards.groupBy("shard").count().orderBy("shard").show()
    // count from the WRITTEN layout — recounting `corpus` would re-run
    // the whole verdict/join chain a second time
    println(s"curated ${shards.count()} of " +
      s"${sources.Tables.documents(spark, sfDir).count()} docs into " +
      s"${shards.select("shard").distinct().count()} shards at $outDir/shards")

    spark.stop()
  }
}
