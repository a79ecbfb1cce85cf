package graft

/** Smoke-runs EVERY registered query at sf0.001: the oracle gate covers the
  * SQL-expressible ones at sf0.01, but a non-oracle operator (LSH, stateful,
  * stub shapes) could otherwise break at runtime without any test noticing
  * until the driver's round report.
  */
class AllQueriesSpec extends SparkSpec {

  test("every SparkEntry.queries entry executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("queries without an oracle are the known non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_simhash_pairs",
      "q_dedup_clusters", "q_dedup_ngram", "q_dedup_embed",
      "q_dedup_source_overlap", "q_sim_ann_lsh", "q_sim_ann_ivf",
      "q_text_langid", "q_text_fingerprint", "q_approx_distinct",
      "q_quantiles_approx", "q_multimodal_decode",
      "q_multimodal_frames", "q_multimodal_resize",
      "q_dedup_keep", "q_cluster_profile", "q_sim_ann_batch", "q_ann_recall",
      "q_text_compress", "q_index_health", "q_dedup_incremental",
      // trained product quantizer — k-means codebooks are not
      // cross-engine expressible (the q_sim_ann_ivf class); AnnPqSpec
      // pins output equality with the oracle-checked q_sim_topk
      "q_sim_ann_pq",
      // IVF-PQ composes the two engine-state approximations; AnnPqSpec
      // pins candidates ⊆ probed cells + recall floors vs both parents
      "q_sim_ann_ivfpq",
      // batched form of the same composition (q_sim_ann_batch class)
      "q_sim_ann_ivfpq_batch",
      // distortion audit of the trained PQ codebooks (H: k-means state)
      "q_quantize_pq",
      // tier cost card over engine geometry laws (S: prices the
      // engine's own index families; no cross-engine referent exists)
      "q_tier_advisor",
      // HLL++ cardinalities on the profile card (A: the q_approx_distinct
      // sketch-vs-sketch mismatch); ShuffleAuditSpec pins the 3σ rsd
      // bound vs the oracle'd exact card
      "q_profile_events_hll")
    assert(rowsOnly == expected,
      s"unexpected rows-only queries: ${rowsOnly -- expected}; " +
        s"missing: ${expected -- rowsOnly}")
  }
}
