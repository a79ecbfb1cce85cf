package graft

import org.apache.spark.sql.functions._

/** Dev tool: push the DEDUP family a decade, the way the ANN family got
  * one (r19 verdict #5 — r17/r18 decade pushes each found defects the
  * spec fixtures never would: dir-per-bucket meltdown, orTree
  * StackOverflow, two-level misfiling).
  *
  * Corpus: the r13/r14 8×-adversarial-dup recipe scaled a decade past
  * sf0.1 — `nBase` deterministic synthetic docs (5 langs × 20 sources,
  * 60–260 words) each replicated 8× under shifted ids: copies 1–5 EXACT
  * (the exact-first collapse's work), copies 6–7 NEAR-dups (one appended
  * token — survives exact dedup, must pair by banding). Default
  * nBase=62500 → 500k docs, ~10× the sf0.1 table's rows at 100× its
  * distinct-doc count.
  *
  * r20 (verdict #4): the text is now LANGUAGE-REALISTIC, not numeric
  * tokens — each doc samples words from its language's high-frequency
  * word list (langs carry the REAL codes de/en/es/fr/zh; the r19 corpus
  * said l0–l4, so the self-trained langid profiles — hardwired to the
  * five real codes — trained on zero docs and the confusion matrix was
  * empty), es/fr deliberately share function words so the confusion
  * matrix is nontrivial; and every 17th base doc is PLANTED with one of
  * [[ContamSentences]] 15-word benchmark sentences at text start — 17 is
  * coprime with the eval-slice mod 10 and the 7 sentences cycle through
  * the eval slice, so cross-slice eval/train 13-gram overlap exists BY
  * CONSTRUCTION (exactly 3 fully-in-sentence grams per planted doc) and
  * decontaminate/langid/tfidf/lm_quality all produce nonzero decade
  * outputs with checkable invariants (asserted below for family=text).
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

  /** Per-language high-frequency word lists (public function-word
    * inventories): distinct char-bigram mass per language, with es/fr
    * sharing several words on purpose — genuine langid confusion.
    */
  val LangVocab: Map[String, IndexedSeq[String]] = Map(
    "de" -> "der die und in den von zu das mit sich des auf ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über einen so zum war haben nur oder aber vor zur bis mehr durch man".split(" ").toIndexedSeq,
    "en" -> "the of and to in is was that for with as his on at by from it an were which be this have not are but had they you she her him all we when who will more no if out so said what its about into than them can only other new some time".split(" ").toIndexedSeq,
    "es" -> "de la que el en y a los del se las por un para con no una su al lo como más pero sus le ya o este sí porque esta entre cuando muy sin sobre también me hasta hay donde quien desde todo nos durante todos uno les".split(" ").toIndexedSeq,
    "fr" -> "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont avec son aux cette ses mais comme ou si leur y dont elle deux même nous aussi leur bien où sans peut ces".split(" ").toIndexedSeq,
    "zh" -> "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 用 们 生 到 作 地 于 出 就 分 对 成 会 可 主 发 年 动 同 工 也 能 下 过 子 说 产 种".split(" ").toIndexedSeq)

  val Langs: IndexedSeq[String] = IndexedSeq("de", "en", "es", "fr", "zh")

  /** 7 deterministic 15-word "benchmark" sentences (7 is coprime with the
    * plant stride 17 × eval mod 10, so every sentence reaches the eval
    * slice). 15 words ⇒ exactly 3 word-13-grams fully inside the
    * sentence — the expected n_shared_grams of every planted train doc.
    */
  val ContamSentences: IndexedSeq[String] = {
    val v = LangVocab("en")
    IndexedSeq.tabulate(7)(j =>
      Seq.tabulate(15)(w => v((j * 31 + w * 7 + 3) % v.size)).mkString(" "))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_dedup500k")
    val nBase = args.find(_.startsWith("nBase="))
      .map(_.stripPrefix("nBase=").toInt).getOrElse(62500)
    val spark = GraftSession.create()
    import spark.implicits._

    val docsPath = s"$dir/documents.parquet"
    val expected = nBase * 8L
    // regenerate when the row count OR the corpus generation differs (the
    // r19 corpus carried l0–l4 lang codes — see the scaladoc)
    val exists = try {
      val df = spark.read.parquet(docsPath)
      df.count() == expected &&
        Langs.contains(df.select("lang").head().getString(0))
    } catch { case _: Throwable => false }
    if (!exists) {
      println(s"[dedupscale] generating corpus nBase=$nBase -> $expected docs")
      val base = spark.range(0, nBase.toLong, 1, 32).map { i =>
        val rnd = new scala.util.Random(47L * (i + 1))
        val lang = Langs((i % 5).toInt)
        val vocab = LangVocab(lang)
        val n = 60 + rnd.nextInt(200)
        val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val text = if (i % 17 == 0)
          s"${ContamSentences((i % 7).toInt)} $body" else body
        (i, text, lang, s"s${i % 20}")
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
    if (family == "text") {
      // r20 decade invariants: the planted structure must be RECOVERED,
      // not just produce rows (verdict #4's done-gate)
      val conf = SparkEntry.queries("q_text_langid")(spark, dir).collect()
      val total = conf.map(_.getLong(2)).sum
      val diag = conf.filter(r => r.getString(0) == r.getString(1))
        .map(_.getLong(2)).sum
      println(f"[dedupscale] langid diag=$diag total=$total " +
        f"acc=${diag.toDouble / math.max(total, 1)}%.4f (cells=${conf.length})")
      assert(total > 0, "langid confusion matrix empty at the decade")
      assert(diag.toDouble / total >= 0.8,
        f"langid decade accuracy ${diag.toDouble / total}%.3f below the 0.8 floor")
      val decon = SparkEntry.queries("q_decontaminate")(spark, dir).collect()
      assert(decon.nonEmpty, "decontaminate found no planted contamination")
      decon.foreach { r =>
        val id = r.getLong(0); val shared = r.getLong(1)
        assert(id % 1000000 % 17 == 0 && id % 10 != 0,
          s"non-planted doc $id surfaced in the contamination card")
        // ≥ 3: the sentence's fully-inside grams are guaranteed; the
        // card sorts by count DESC, so its top rows are exactly the docs
        // whose sentence→body BOUNDARY grams also genuinely matched an
        // eval doc's body start (real overlap, verified by hand in r20)
        assert(shared >= 3L,
          s"planted doc $id: expected >= 3 shared 13-grams, got $shared")
      }
      println(s"[dedupscale] decontaminate top-${decon.length}: " +
        "all planted train docs, >= 3 shared grams each")
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
