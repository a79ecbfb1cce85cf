package graft

import org.apache.spark.sql.functions._

/** Dev tool: push the DEDUP family a decade, the way the ANN family got
  * one (r19 verdict #5 — r17/r18 decade pushes each found defects the
  * spec fixtures never would: dir-per-bucket meltdown, orTree
  * StackOverflow, two-level misfiling).
  *
  * Corpus: the r13/r14 8×-adversarial-dup recipe scaled a decade past
  * sf0.1 — `nBase` deterministic synthetic docs (numeric-token text, the
  * DedupSimilaritySpec fixture vocabulary at 500× size; 5 langs × 20
  * sources, 60–260 words) each replicated 8× under shifted ids: copies
  * 1–5 EXACT (the exact-first collapse's work), copies 6–7 NEAR-dups
  * (one appended token — survives exact dedup, must pair by banding).
  * Default nBase=62500 → 500k docs, ~10× the sf0.1 table's rows at 100×
  * its distinct-doc count.
  *
  * Per query: cold wall (first call per corpus = artifact/band-store
  * build) + warm min-of-3 steady state; then the decade observables —
  * label-propagation iteration count + convergence flag
  * ([[graft.operators.Dedup.lastPropagation]]), cluster/pair/store row
  * counts, and the steady-state shuffle bytes of the pair searchers
  * (ShuffleAudit — band keys, never text, is the 100 TB claim).
  *
  * Usage: runMain graft.DevDedupScaleBench [outDir] [nBase=62500]
  */
object DevDedupScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_dedup500k")
    val nBase = args.find(_.startsWith("nBase="))
      .map(_.stripPrefix("nBase=").toInt).getOrElse(62500)
    val spark = GraftSession.create()
    import spark.implicits._

    val docsPath = s"$dir/documents.parquet"
    val expected = nBase * 8L
    val exists = try spark.read.parquet(docsPath).count() == expected
      catch { case _: Throwable => false }
    if (!exists) {
      println(s"[dedupscale] generating corpus nBase=$nBase -> $expected docs")
      val base = spark.range(0, nBase.toLong, 1, 32).map { i =>
        val rnd = new scala.util.Random(47L * (i + 1))
        val n = 60 + rnd.nextInt(200)
        val text = Seq.fill(n)(rnd.nextInt(50000).toString).mkString(" ")
        (i, text, s"l${i % 5}", s"s${i % 20}")
      }.toDF("doc_id", "text", "lang", "source")
      val copies = (1 to 7).map { c =>
        val mutated =
          if (c >= 6) concat(col("text"), lit(s" zz${c}mut"))
          else col("text")
        base.select((col("doc_id") + lit(1000000L * c)).as("doc_id"),
          mutated.as("text"), col("lang"), col("source"))
      }
      copies.foldLeft(base)(_ unionByName _)
        .withColumn("n_chars", length(col("text")).cast("bigint"))
        .write.mode("overwrite").parquet(docsPath)
    }
    println(s"[dedupscale] corpus rows=${spark.read.parquet(docsPath).count()}")

    // family=dedup|text|curation (r19: the decade corpus serves every
    // documents-fed family, not just the dedup searchers)
    val family = args.find(_.startsWith("family="))
      .map(_.stripPrefix("family=")).getOrElse("dedup")
    val names = family match {
      case "text" => Seq(
        "q_text_stats", "q_text_tokens", "q_text_quality", "q_text_langid",
        "q_text_chunks", "q_text_tfidf", "q_lm_quality", "q_lm_filter",
        "q_text_compress", "q_text_fingerprint", "q_text_redact",
        "q_pii_card", "q_decontaminate", "q_ngram_counts", "q_corpus_filter",
        "q_source_drift", "q_topic_terms", "q_source_quality",
        "q_text_repetition", "q_mix_report")
      case "curation" => Seq(
        "q_sample_balanced", "q_split_assign", "q_length_bins",
        "q_domain_cap", "q_mix_sample", "q_shuffle_shards",
        "q_pack_sequences")
      case _ => Seq(
        "q_dedup_exact", "q_dup_inflation", "q_dedup_minhash",
        "q_dedup_clusters", "q_dedup_keep", "q_dedup_simhash",
        "q_dedup_simhash_pairs", "q_dedup_ngram", "q_dedup_source_overlap",
        "q_dedup_incremental", "q_boilerplate", "q_top_passages")
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows0 = fn(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val walls = (1 to 3).map { _ =>
        val t = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t) / 1e9
      }
      println(f"[dedupscale] $name%-24s cold ${cold}%8.3f s  " +
        f"steady ${walls.min}%6.3f s  rows $rows0%8d")
      if (name == "q_dedup_clusters") {
        val (iters, conv) = graft.operators.Dedup.lastPropagation.get()
        println(s"[dedupscale]   propagation iters=$iters converged=$conv")
      }
    }
    // steady-state shuffle bytes: the searchers must move band keys,
    // never the 450 MB text payload — per-record B and absolute bytes
    val audited = ShuffleAudit.measure(spark, dir, family match {
      case "text" => Seq("q_text_tfidf", "q_decontaminate",
        "q_corpus_filter", "q_ngram_counts", "q_lm_filter")
      case "curation" => Seq("q_domain_cap", "q_pack_sequences",
        "q_sample_balanced", "q_shuffle_shards")
      case _ => Seq(
        "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash_pairs",
        "q_dedup_ngram", "q_dedup_incremental", "q_dedup_clusters",
        "q_boilerplate")
    })
    audited.toSeq.sortBy(_._1).foreach { case (n, a) =>
      println(f"[dedupscale] shuffle $n%-24s ${a.shuffleBytes}%12d B  " +
        f"(${a.shuffleRecords}%9d recs, input ${a.inputRecords}%9d)")
    }
    spark.stop()
  }
}
