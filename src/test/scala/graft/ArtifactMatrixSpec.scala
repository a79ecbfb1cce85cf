package graft

import org.apache.spark.sql.functions._
import graft.sources.{SessionCache, Tables}

/** The table-driven mutation-pin matrix over the FULL session-artifact
  * inventory (r16 verdict #3). SCALING.md's inventory table is the source
  * of truth: this spec parses it, requires a registry pin for every row
  * (and a row for every pin — two-way sync, so adding an artifact without
  * documenting + pinning it fails loudly), then for each corpus group
  * copies the tables to a scratch dir, runs every pinned query, APPENDS a
  * mutation, re-runs, and asserts per artifact family:
  *
  *  (a) a FRESH build was logged under the post-mutation fingerprint
  *      ([[SessionCache.buildLog]]) — the invalidate/supersede machinery
  *      fired rather than serving the stale generation;
  *  (b) where the mutation provably moves the answer (`expectChange`),
  *      the query result actually changed — the end-to-end catch for the
  *      recurring probes-first / stale-catalog class (a rebuild that READ
  *      the pre-mutation listing produces the old answer under a new
  *      fingerprint, which (a) alone cannot see).
  *
  * Families whose output is legitimately mutation-insensitive at this SF
  * (recall cards, capped top-k lists) carry `expectChange = false` and
  * are covered by (a) plus their own per-family specs.
  */
class ArtifactMatrixSpec extends SparkSpec {

  // ---------- inventory (SCALING.md is the source of truth) ----------

  private lazy val inventoryCells: Seq[String] = {
    val lines = scala.io.Source.fromFile("SCALING.md", "UTF-8").getLines().toSeq
    val start = lines.indexWhere(_.trim.startsWith("| artifact | serves |"))
    assert(start >= 0, "SCALING.md session-artifact inventory header not found")
    lines.drop(start + 2)
      .takeWhile(l => l.trim.startsWith("|"))
      .map(_.split("\\|")(1).trim
        .replace("&lt;", "<").replace("&gt;", ">"))
  }

  // ---------- registry: one pin per artifact FAMILY ----------

  /** `pattern` matches the artifact base name as logged (full match);
    * `query` is the SparkEntry registry entry that builds the family;
    * `corpus` picks the mutation group.
    */
  private case class Pin(
      pattern: String, query: String, corpus: String,
      expectChange: Boolean = true) {
    val rx: scala.util.matching.Regex = ("^" + pattern + "$").r
    def matches(artifact: String): Boolean = rx.findFirstIn(artifact).isDefined
  }

  private val registry: Map[String, Seq[Pin]] = Map(
    "balance_boundary_lang_doc_id" ->
      Seq(Pin("balance_boundary_lang_doc_id", "q_sample_balanced", "documents")),
    "length_bins_bounds" ->
      Seq(Pin("length_bins_bounds", "q_length_bins", "documents")),
    "minmax_bounds" ->
      Seq(Pin("minmax_bounds", "q_minmax_scale", "events")),
    "recent_entities_20" ->
      Seq(Pin("recent_entities_20", "q_metric_summary", "events")),
    "pack_offsets_s<shard>" ->
      Seq(Pin("pack_offsets_s\\d+", "q_pack_sequences", "documents")),
    "cap_hist" ->
      Seq(Pin("cap_hist", "q_domain_cap", "documents")),
    "user_counts" ->
      Seq(Pin("user_counts", "q_heavy_hitters", "events")),
    "profile_card" ->
      Seq(Pin("profile_card", "q_profile_events", "events")),
    "embed_centroids" ->
      Seq(Pin("embed_centroids", "q_embed_outliers", "embeddings")),
    "ann_recall_*" ->
      Seq(Pin("ann_recall_.*", "q_ann_recall", "embeddings", expectChange = false)),
    "cluster_cells_*" ->
      Seq(Pin("cluster_cells_.*", "q_cluster_profile", "embeddings")),
    "index_health_*" ->
      Seq(Pin("index_health_.*", "q_index_health", "embeddings")),
    "langid_profiles" ->
      Seq(Pin("langid_profiles", "q_text_langid", "documents")),
    "langid_scored" ->
      Seq(Pin("langid_scored", "q_text_langid", "documents")),
    "lm_scores" ->
      Seq(Pin("lm_scores", "q_lm_quality", "documents")),
    "lm_terciles" ->
      Seq(Pin("lm_terciles", "q_lm_filter", "documents")),
    "filter_verdicts" ->
      Seq(Pin("filter_verdicts", "q_corpus_filter", "documents")),
    "tfidf_stats" ->
      Seq(Pin("tfidf_stats", "q_text_tfidf", "documents")),
    "source_token_stats" ->
      Seq(Pin("source_token_stats", "q_source_drift", "documents")),
    "source_sketches" ->
      Seq(Pin("source_sketches", "q_dedup_source_overlap", "documents")),
    "eval_gram_set_13" ->
      Seq(Pin("eval_gram_set_13", "q_decontaminate", "documents", expectChange = false)),
    "contamination_13" ->
      Seq(Pin("contamination_13", "q_decontaminate", "documents", expectChange = false)),
    "bigram_counts" ->
      Seq(Pin("bigram_counts", "q_ngram_counts", "documents")),
    "boilerplate_card" ->
      Seq(Pin("boilerplate_card", "q_boilerplate", "documents")),
    "passage_top20" ->
      Seq(Pin("passage_top20", "q_top_passages", "documents", expectChange = false)),
    "simhash_fps" ->
      Seq(Pin("simhash_fps", "q_dedup_simhash", "documents")),
    "minhash_pairs_c* / simhash_pairs_c* / ngram_pairs_c* / embed_pairs" -> Seq(
      Pin("minhash_pairs_c\\d+", "q_dedup_minhash", "documents"),
      Pin("simhash_pairs_c\\d+", "q_dedup_simhash_pairs", "documents"),
      Pin("ngram_pairs_c\\d+", "q_dedup_ngram", "documents"),
      Pin("embed_pairs", "q_dedup_embed", "embeddings")),
    "neardup_labels_*" ->
      Seq(Pin("neardup_labels_.*", "q_dedup_clusters", "documents")),
    "inc_band_store" ->
      Seq(Pin("inc_band_store", "q_dedup_incremental", "documents", expectChange = false)),
    "lsh_cand_q0_f*" ->
      Seq(Pin("lsh_cand_q0_f\\d+", "q_sim_ann_lsh", "embeddings", expectChange = false)))

  private def allPins: Seq[Pin] = registry.values.flatten.toSeq

  test("inventory and matrix registry are in two-way sync") {
    val inv = inventoryCells.toSet
    val reg = registry.keySet
    assert(inv == reg,
      s"SCALING.md inventory and ArtifactMatrixSpec registry diverged.\n" +
        s"rows without a pin: ${(inv -- reg).toSeq.sorted}\n" +
        s"pins without a row: ${(reg -- inv).toSeq.sorted}")
    // and every pinned query really exists in the engine registry
    allPins.foreach(p => assert(SparkEntry.queries.contains(p.query),
      s"pin ${p.pattern} names unknown query ${p.query}"))
  }

  // ---------- matrix machinery ----------

  private def copyCorpus(tmp: String): Unit =
    Seq("documents", "events", "embeddings").foreach { t =>
      val df = t match {
        case "documents" => Tables.documents(spark, sf)
        case "events" => Tables.events(spark, sf)
        case "embeddings" => Tables.embeddings(spark, sf)
      }
      df.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }

  /** artifact base name -> fingerprints built for `dir` so far. */
  private def builtFor(dir: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    SessionCache.buildLog.asScala.toSet[String]
      .filter(_.contains(s"|$dir|"))
      .map { e =>
        val i = e.indexOf('|'); val j = e.lastIndexOf('|')
        (e.substring(0, i), e.substring(j + 1))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  private val unmatchedBuilds = scala.collection.mutable.Set[String]()

  private def runGroup(corpus: String)(mutate: String => Unit): Unit = {
    val pins = allPins.filter(_.corpus == corpus)
    val queries = pins.map(_.query).distinct
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_matrix_$corpus").toString
    try {
      copyCorpus(tmp)
      val before = queries.map(q =>
        q -> canon(SparkEntry.queries(q)(spark, tmp).collect())).toMap
      val builtBefore = builtFor(tmp)
      pins.foreach { p =>
        assert(builtBefore.keys.exists(p.matches),
          s"${p.pattern}: matrix run must build the artifact pre-mutation " +
            s"(built: ${builtBefore.keys.toSeq.sorted})")
      }
      mutate(tmp)
      val after = queries.map(q =>
        q -> canon(SparkEntry.queries(q)(spark, tmp).collect())).toMap
      val builtAfter = builtFor(tmp)
      pins.foreach { p =>
        // (a) fresh build under a NEW fingerprint
        val fresh = builtAfter.collect {
          case (a, fps) if p.matches(a) =>
            fps -- builtBefore.collect { case (b, f) if b == a => f }.flatten
        }.flatten
        assert(fresh.nonEmpty,
          s"${p.pattern}: no fresh build after the corpus mutation — " +
            "stale artifact served (supersede/invalidate did not fire)")
        // (b) the answer moved where the mutation guarantees it
        if (p.expectChange)
          assert(before(p.query) != after(p.query),
            s"${p.pattern} via ${p.query}: result identical after a " +
              "mutation that must move it — the rebuild read a stale " +
              "catalog listing (the probes-first class)")
      }
      // ledger for the unregistered-name check below
      builtAfter.keys.foreach { a =>
        if (!allPins.exists(_.matches(a))) { unmatchedBuilds += a; () }
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("documents-fed artifacts rebuild fresh and see the mutated corpus") {
    runGroup("documents") { tmp =>
      // two plants in one append:
      //  (a) near-dups IN THE ORIGINAL (lang, source) blocks — the pair
      //      searches block on (lang, source, length band), so a mutant
      //      in a new stratum could never pair with its original; and
      //      the ngram family collapses EXACT copies first (the
      //      exact-first spec), so the text gains one token;
      //  (b) a brand-new (lang, source) stratum for the card families
      //      (balance floor, length bins, packs, cap histogram, source
      //      cards, langid confusion).
      val docs = Tables.documents(spark, sf)
      val nearDups = docs.limit(5)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("text", concat(col("text"), lit(" zzmutant")))
        .withColumn("n_chars", length(col("text")).cast("bigint"))
      val newStratum = docs.limit(5)
        .withColumn("doc_id", col("doc_id") + lit(2000000L))
        .withColumn("source", lit("mutant.example"))
        .withColumn("lang", lit("zz"))
      nearDups.unionByName(newStratum)
        .write.mode("append").parquet(s"$tmp/documents.parquet")
    }
  }

  test("events-fed artifacts rebuild fresh and see the mutated corpus") {
    runGroup("events") { tmp =>
      // one heavy new user with 100x values at the newest timestamps:
      // minmax bounds, the recency card, and the heavy-hitter top-20
      // must all move
      val ev = Tables.events(spark, sf)
      ev.limit(50)
        .withColumn("event_id", col("event_id") + lit(1000000L))
        .withColumn("user_id", lit(999999L))
        .withColumn("value", col("value") * 100)
        .withColumn("ts", expr("ts + INTERVAL 400 DAYS"))
        .write.mode("append").parquet(s"$tmp/events.parquet")
    }
  }

  test("embeddings-fed artifacts rebuild fresh and see the mutated corpus") {
    runGroup("embeddings") { tmp =>
      // exact duplicate vectors under new ids: the embed pair search must
      // surface cos=1 pairs, the cell/health cards must grow
      Tables.embeddings(spark, sf).limit(5)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
        .write.mode("append").parquet(s"$tmp/embeddings.parquet")
    }
  }

  test("every artifact built during the matrix runs is inventoried") {
    // a new SessionCache.cached call site reached from any pinned query
    // lands here unless its family has a SCALING.md row + registry pin
    assert(unmatchedBuilds.isEmpty,
      s"unregistered artifact families built: ${unmatchedBuilds.toSeq.sorted} — " +
        "add a SCALING.md inventory row and an ArtifactMatrixSpec pin")
  }
}
