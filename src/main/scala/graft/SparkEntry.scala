package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2; [[oracleSql]]
  * carries the DuckDB-dialect twin the driver hash-compares against. Column
  * names and row order are aligned on both sides (total-order ORDER BY,
  * DECIMAL-exact money sums cast to DOUBLE — SURVEY.md §5.4/§7.5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join + aggregate — exercises scan, pushdown, broadcast
    * join, hash agg, sort (SURVEY.md §7.3 step 2).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every entry serves through the prepared-plan cache
    * ([[graft.sources.PlanCache]], r18): repeat evaluations of a
    * registry query reuse the built+analyzed plan (fingerprint- and
    * conf-keyed, mutation-invalidating) while optimization, physical
    * planning, AQE and execution stay per-call — the prepared-statement
    * discipline a serving deployment runs, and the measured answer to
    * the per-query driver-side floor (~13% of the warm suite wall;
    * BASELINE.md r18 A/B). `spark.graft.planCache=false` bypasses it.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> ((spark: SparkSession, dir: String) =>
        graft.sources.PlanCache.cached(spark, name, dir)(fn(spark, dir)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 projections / filters / predicates
    "q_filter_eq"       -> (Relational.filterEq _),
    "q_point_lookup"    -> (Relational.pointLookup _),
    "q_prefix_like"     -> (Relational.prefixLike _),
    "q_search_contains" -> (Relational.searchContains _),
    "q_inlist_series"   -> (Relational.inlistSeries _),
    // §2.6 sorts / limits / top-k
    "q_list_sort_limit" -> (Relational.listSortLimit _),
    "q_series_fetch"    -> (Relational.seriesFetch _),
    // §2.4 aggregations
    "q_distinct_keys"   -> (Relational.distinctKeys _),
    "q_last_per_group"  -> (Relational.lastPerGroup _),
    "q_best_per_entity" -> (Relational.bestPerEntity _),
    // §2.3 joins
    "q_join_agg"        -> (Relational.joinAgg _),
    "q_antijoin_absent" -> (Relational.antijoinAbsent _),
    // tracking semantics (§2.3 J3-J5, §2.4 A1, §2.5, §2.8)
    "q_stale_detect"    -> (Tracking.staleDetect _),
    "q_upsert_latest"   -> (Tracking.upsertLatest _),
    "q_window_rank"     -> (Tracking.windowRank _),
    "q_delete_cascade"  -> (Tracking.deleteCascade _),
    "q_param_pivot"     -> (Tracking.paramPivot _),
    "q_duration_derive" -> (Tracking.durationDerive _),
    "q_display_format"  -> (Tracking.displayFormat _),
    "q_minmax_scale"    -> (Tracking.minmaxScale _),
    "q_series_downsample" -> (Tracking.seriesDownsample _),
    "q_json_extract"    -> (Tracking.jsonExtract _),
    "q_quantiles"       -> (Tracking.quantiles _),
    "q_histogram"       -> (Tracking.histogram _),
    "q_approx_distinct" -> (Tracking.approxDistinct _),
    "q_quantiles_approx" -> (Tracking.quantilesApprox _),
    "q_series_smooth"   -> (Tracking.seriesSmooth _),
    "q_metric_trend"    -> (Tracking.metricTrend _),
    "q_sample_balanced" -> (Sampling.sampleDocuments _),
    "q_split_assign"    -> (Sampling.splitAssign _),
    "q_pack_sequences"  -> ((s, d) => Sampling.packSequences(s, d)),
    "q_length_bins"     -> (Sampling.lengthBins _),
    "q_shuffle_shards"  -> (Sampling.shuffleShards _),
    "q_mix_sample"      -> (Sampling.mixSample _),
    "q_domain_cap"      -> ((s, d) => Sampling.domainCap(s, d)),
    // temporal alignment + multi-level aggregates
    "q_asof_align"      -> (Temporal.asofAlign _),
    "q_sessionize"      -> (Temporal.sessionize _),
    "q_rollup_revenue"  -> (Relational.rollupRevenue _),
    // analytic composites (§2.7 set ops, §2.4 A3+J1+O3 summary, §2.5
    // deltas/analytics, §2.3 range join, §2.4 cube)
    "q_set_ops"         -> (Analytics.setOps _),
    "q_metric_summary"  -> (Analytics.metricSummary _),
    "q_lag_delta"       -> (Analytics.lagDelta _),
    "q_range_join"      -> (Analytics.rangeJoin _),
    "q_cube_orders"     -> (Analytics.cubeOrders _),
    "q_window_analytics" -> (Analytics.windowAnalytics _),
    "q_full_outer"      -> (Analytics.fullOuterAlign _),
    "q_exists_subquery" -> (Analytics.existsSubquery _),
    "q_correlated_scalar" -> (Analytics.correlatedScalar _),
    "q_heavy_hitters"   -> (Analytics.heavyHitters _),
    "q_profile_events"  -> (Analytics.profileEvents _),
    "q_profile_events_hll" -> (Analytics.profileEventsApprox _),
    // extensions: similarity search (§2.6 O4)
    "q_sim_topk"        -> (Similarity.simTopK _),
    "q_sim_topk_batch"  -> (Similarity.simBatchTopK _),
    "q_sim_ann_batch"   -> (Similarity.simAnnBatch _),
    "q_ann_recall"      -> (Similarity.annRecall _),
    "q_knn_label"       -> (Similarity.knnLabel _),
    "q_vector_norms"    -> (Similarity.vectorNorms _),
    "q_sim_ann_lsh"     -> (Similarity.simAnnLsh _),
    "q_sim_ann_ivf"     -> (Similarity.simAnnIvf _),
    // extensions: deduplication (§2.4 A4 + north_star)
    "q_dedup_exact"     -> (Dedup.dedupExact _),
    "q_dedup_minhash"   -> (Dedup.dedupMinhash _),
    "q_dedup_clusters"  -> (Dedup.dedupClusters _),
    "q_dedup_simhash"   -> (Dedup.dedupSimhash _),
    "q_dedup_simhash_pairs" -> (Dedup.dedupSimhashPairs _),
    "q_dedup_ngram"     -> (Dedup.dedupNgram _),
    "q_dedup_embed"     -> (Dedup.dedupEmbed _),
    "q_dedup_source_overlap" -> (Dedup.sourceOverlap _),
    "q_dedup_keep"      -> (Dedup.dedupKeep _),
    // extensions: text analysis (§2.8 F9)
    "q_text_stats"      -> (TextAnalysis.textStats _),
    "q_text_tokens"     -> (TextAnalysis.textTokens _),
    "q_text_quality"    -> (TextAnalysis.textQuality _),
    "q_text_langid"     -> (TextAnalysis.textLangId _),
    "q_text_tfidf"      -> (TextAnalysis.textTfidf _),
    "q_lm_quality"      -> (TextAnalysis.lmQuality _),
    "q_lm_filter"       -> (TextAnalysis.lmFilter _),
    "q_text_chunks"     -> (TextAnalysis.textChunks _),
    "q_text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "q_text_redact"     -> (TextAnalysis.textRedact _),
    "q_decontaminate"   -> (TextAnalysis.decontaminate _),
    "q_mix_report"      -> (TextAnalysis.corpusMix _),
    "q_ngram_counts"    -> (TextAnalysis.ngramCounts _),
    "q_text_repetition" -> (TextAnalysis.textRepetition _),
    "q_text_compress"   -> (TextAnalysis.textCompress _),
    "q_corpus_filter"   -> (TextAnalysis.corpusFilter _),
    "q_source_quality"  -> (TextAnalysis.sourceQuality _),
    "q_boilerplate"     -> (TextAnalysis.boilerplate _),
    "q_top_passages"    -> (TextAnalysis.topPassages _),
    "q_source_drift"    -> (TextAnalysis.sourceDrift _),
    "q_topic_terms"     -> (TextAnalysis.topicTerms _),
    "q_cluster_profile" -> (Similarity.clusterProfile _),
    "q_index_health"    -> (Similarity.indexHealth _),
    "q_tier_advisor"    -> (Similarity.tierAdvisor _),
    "q_quantize_embed"  -> (Similarity.quantizeEmbed _),
    "q_quantize_pq"     -> (Similarity.quantizePq _),
    "q_sim_ann_int8"    -> (Similarity.simAnnInt8 _),
    "q_sim_ann_int8_batch" -> (Similarity.simAnnInt8Batch _),
    "q_sim_ann_pq"      -> (Similarity.simAnnPq _),
    "q_sim_ann_ivfpq"   -> (Similarity.simAnnIvfPq _),
    "q_sim_ann_ivfpq_batch" -> (Similarity.simAnnIvfPqBatch _),
    "q_dedup_incremental" -> (Dedup.dedupIncremental _),
    "q_embed_dim_stats" -> (Similarity.embedDimStats _),
    "q_embed_outliers"  -> (Similarity.embedOutliers _),
    "q_dup_inflation"   -> (Dedup.dupInflation _),
    "q_pii_card"        -> (TextAnalysis.piiCard _),
    // extensions: multimodal binary columns (§2.1 S4)
    "q_multimodal_meta"   -> (Multimodal.multimodalMeta _),
    "q_multimodal_decode" -> (Multimodal.multimodalDecode _),
    "q_multimodal_frames" -> ((s, d) => Multimodal.multimodalFrames(s, d)),
    "q_multimodal_resize" -> ((s, d) => Multimodal.multimodalResize(s, d)),
  )

  // q_mix_sample's threshold/target CASEs, generated from the SAME
  // Sampling.MixWeights constants the operator folds into its plan — the
  // two sides cannot drift
  private def mixCase(f: ((String, Double)) => String, default: String) =
    Sampling.MixWeights.toSeq.sortBy(_._1)
      .map { case (l, w) => s"WHEN lang = '$l' THEN ${f((l, w))}" }
      .mkString("CASE ", " ", s" ELSE $default END")

  /** DuckDB-runnable twin per query key (driver registers each parquet file
    * as a view named by table). Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey = 42 ORDER BY o_orderkey",
    "q_prefix_like" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_type NOT LIKE 's%'
        |ORDER BY event_id""".stripMargin,
    "q_search_contains" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE lower(concat_ws(' ', c_name, c_mktsegment)) LIKE '%building%'
        |ORDER BY c_custkey""".stripMargin,
    "q_inlist_series" ->
      """SELECT event_id, user_id, event_type, ts, value
        |FROM events WHERE user_id IN (1, 2, 3, 5, 8, 13)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_list_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey ASC
        |LIMIT 200 OFFSET 20""".stripMargin,
    "q_series_fetch" ->
      """SELECT event_id, ts, value
        |FROM events WHERE user_id = 7 AND event_type = 'click'
        |ORDER BY ts, event_id LIMIT 5000""".stripMargin,
    "q_distinct_keys" ->
      """SELECT DISTINCT event_type FROM events
        |WHERE event_type NOT LIKE 's%' ORDER BY event_type""".stripMargin,
    "q_last_per_group" ->
      """SELECT user_id, event_type,
        |       max(event_id) AS last_event_id,
        |       max_by(value, event_id) AS last_value
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_best_per_entity" ->
      """SELECT o_custkey,
        |       min_by(o_orderkey, o_totalprice) AS best_orderkey,
        |       min(o_totalprice) AS best_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |            AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_antijoin_absent" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_stale_detect" ->
      """SELECT user_id, max(ts) AS last_ts,
        |       CASE WHEN max(ts) < TIMESTAMP '2024-01-30 23:55:00'
        |            THEN 'aborted' ELSE 'running' END AS status
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_upsert_latest" ->
      """SELECT user_id, event_type, ts, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                   ORDER BY event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_window_rank" ->
      """SELECT user_id, rn, event_id, event_type
        |FROM (SELECT user_id, event_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q_delete_cascade" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events
        |                      WHERE event_type = 'error' AND value > 150.0)
        |ORDER BY event_id""".stripMargin,
    "q_param_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(SUM(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_duration_derive" ->
      """SELECT user_id, duration_sec, n_events,
        |       CASE WHEN duration_sec < 60 THEN concat(duration_sec, 's')
        |            ELSE concat(duration_sec // 60, 'm') END AS duration_label
        |FROM (SELECT user_id,
        |             date_diff('second', min(ts), max(ts)) AS duration_sec,
        |             count(*) AS n_events
        |      FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,
    "q_display_format" ->
      """SELECT o_orderkey,
        |       substring(CAST(o_orderkey AS VARCHAR), 1, 8) AS id8,
        |       strftime(o_orderdate, '%Y-%m-%d') AS date_label,
        |       CASE WHEN b < 1024 THEN concat(b, 'B')
        |            WHEN b < 1048576 THEN
        |              concat(((b*10)//1024)//10, '.', ((b*10)//1024)%10, 'KB')
        |            ELSE
        |              concat(((b*10)//1048576)//10, '.', ((b*10)//1048576)%10, 'MB')
        |       END AS size_label
        |FROM (SELECT *, CAST(floor(o_totalprice) AS BIGINT) AS b FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_series_downsample" ->
      """SELECT user_id, event_type, date_trunc('day', ts) AS day,
        |       count(*) AS n_points,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value
        |FROM events WHERE user_id <= 20
        |GROUP BY user_id, event_type, date_trunc('day', ts)
        |ORDER BY user_id, event_type, day""".stripMargin,
    "q_minmax_scale" ->
      """SELECT event_id, user_id, event_type, value,
        |       round((value - mn) / nullif(mx - mn, 0), 6) AS scaled
        |FROM (SELECT *,
        |             min(value) OVER (PARTITION BY event_type) AS mn,
        |             max(value) OVER (PARTITION BY event_type) AS mx
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, user_id,
        |       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin,
    "q_series_smooth" ->
      """SELECT event_id, user_id, event_type, value,
        |       round(avg(value) OVER (PARTITION BY user_id, event_type
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma5,
        |       round(sum(value) OVER (PARTITION BY user_id, event_type
        |             ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |         AS running_total
        |FROM events WHERE user_id = 7
        |ORDER BY event_id""".stripMargin,
    "q_metric_trend" ->
      // x-sums are exact integers (Σx² via DuckDB's HUGEINT sum, matching
      // Spark's DECIMAL(38,0) route — a BIGINT sum of ~7e15 terms wraps),
      // y-sums DECIMAL-routed; slope/r² are the same fixed double-op
      // sequence as the Spark plan on those sums
      """WITH t AS (
        |  SELECT user_id, event_type,
        |         (epoch_us(ts) // 1000000) - 1704067200 AS x, value AS y
        |  FROM events),
        |a AS (
        |  SELECT user_id, event_type, count(*) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy,
        |         CAST(SUM(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(28,12)))
        |              AS DOUBLE) AS sxy
        |  FROM t GROUP BY user_id, event_type)
        |SELECT user_id, event_type, n,
        |  round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |                  CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0 THEN 0.0
        |        ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400.0
        |        END, 6) AS slope_per_day,
        |  round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |                  (CAST(n AS DOUBLE) * syy - sy * sy) = 0 THEN 0.0
        |        ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
        |             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |             ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |              (CAST(n AS DOUBLE) * syy - sy * sy))
        |        END, 6) AS r2
        |FROM a ORDER BY user_id, event_type""".stripMargin,
    "q_quantiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90,
        |       round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_align" ->
      """WITH tagged AS (
        |  SELECT event_id, user_id, ts, value, FALSE AS is_view, value AS view_value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL BY NAME
        |  SELECT event_id, user_id, ts, value, TRUE AS is_view, value AS view_value
        |  FROM events WHERE event_type = 'view')
        |SELECT event_id, user_id, ts, value,
        |       last_value(CASE WHEN is_view THEN view_value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, is_view DESC, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
        |FROM tagged QUALIFY NOT is_view ORDER BY event_id""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT c_mktsegment, o_orderstatus,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q_sim_topk" ->
      """SELECT e.vec_id,
        |       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                    q.qv), 6) AS sim
        |FROM embeddings e,
        |     (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY sim DESC, e.vec_id ASC
        |LIMIT 10""".stripMargin,
    "q_profile_events" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_n,
        |         count(DISTINCT event_id) AS event_id_d,
        |         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_n,
        |         count(DISTINCT user_id) AS user_id_d,
        |         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_n,
        |         count(DISTINCT event_type) AS event_type_d,
        |         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_n,
        |         count(DISTINCT value) AS value_d,
        |         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_n,
        |         count(DISTINCT props) AS props_d
        |  FROM events)
        |SELECT col_name, n_rows, n_nulls,
        |       round(CAST(n_nulls AS DOUBLE) / n_rows, 6) AS null_rate,
        |       n_distinct
        |FROM (
        |  SELECT 'event_id' AS col_name, n_rows, event_id_n AS n_nulls,
        |         event_id_d AS n_distinct FROM s
        |  UNION ALL SELECT 'user_id', n_rows, user_id_n, user_id_d FROM s
        |  UNION ALL SELECT 'event_type', n_rows, event_type_n, event_type_d FROM s
        |  UNION ALL SELECT 'value', n_rows, value_n, value_d FROM s
        |  UNION ALL SELECT 'props', n_rows, props_n, props_d FROM s)
        |ORDER BY col_name""".stripMargin,
    "q_heavy_hitters" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT CAST(SUM(n_rows) AS DOUBLE) AS total, count(*) AS n_keys
        |  FROM counts)
        |SELECT rank, user_id, n_rows,
        |       round(n_rows / total, 6) AS share,
        |       round(n_rows * n_keys / total, 6) AS skew_vs_mean
        |FROM (SELECT user_id, n_rows,
        |             row_number() OVER (ORDER BY n_rows DESC, user_id) AS rank
        |      FROM counts) CROSS JOIN tot
        |WHERE rank <= 20
        |ORDER BY rank""".stripMargin,
    "q_sim_topk_batch" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      q.qv), 6) AS sim
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id >= 5)
        |SELECT qid, rank, vec_id, sim
        |FROM (SELECT qid, vec_id, sim,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY sim DESC, vec_id ASC) AS rank
        |      FROM scored)
        |WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,
    "q_knn_label" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid, e.vec_id, e.label,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      q.qv), 6) AS sim
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id >= 5),
        |knn AS (
        |  SELECT qid, label, sim
        |  FROM (SELECT qid, label, sim,
        |               row_number() OVER (PARTITION BY qid
        |                 ORDER BY sim DESC, vec_id ASC) AS rank
        |        FROM scored)
        |  WHERE rank <= 10),
        |votes AS (
        |  SELECT qid, label, count(*) AS votes,
        |         SUM(CAST(sim AS DECIMAL(18,6))) AS simsum
        |  FROM knn GROUP BY qid, label)
        |SELECT qid, label AS pred_label, votes,
        |       round(CAST(simsum AS DOUBLE) / votes, 6) AS avg_sim
        |FROM (SELECT qid, label, votes, simsum,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY votes DESC, simsum DESC, label ASC) AS r
        |      FROM votes)
        |WHERE r = 1
        |ORDER BY qid""".stripMargin,
    "q_vector_norms" ->
      """SELECT label, count(*) AS n_vecs,
        |       round(min(norm), 6) AS min_norm,
        |       round(CAST(SUM(CAST(norm AS DECIMAL(28,12))) AS DOUBLE)
        |             / count(*), 6) AS avg_norm,
        |       round(max(norm), 6) AS max_norm
        |FROM (SELECT label,
        |             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                          x -> x*x))) AS norm
        |      FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_dedup_exact" ->
      // md5(text) grouping key mirrors the Spark plan (16-byte shuffle
      // keys, not document payloads); DuckDB md5 = Spark md5 = lowercase
      // hex of the same bytes, so the clusters are identical
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q_dup_inflation" ->
      // all-integer card: counts and sums of exact longs, nothing rounds
      """WITH c AS (
        |  SELECT count(*) AS cluster_size,
        |         min(len(string_split(text, ' '))) AS toks
        |  FROM documents GROUP BY md5(text))
        |SELECT cluster_size, count(*) AS n_clusters,
        |       CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
        |       CAST(SUM(cluster_size - 1) AS BIGINT) AS n_surplus_docs,
        |       CAST(SUM((cluster_size - 1) * toks) AS BIGINT) AS surplus_tokens
        |FROM c GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "q_decontaminate" ->
      // string 13-grams instead of the engine's xxhash64 gram hashes: the
      // gram SET is identical (hashing is injective up to 2^-64 collisions
      // on a few hundred grams/doc), so shared-gram counts match exactly.
      // Tokenization mirrors ngram_hashes 'word' mode: split on ' ' keeping
      // empties; docs shorter than 13 tokens emit ONE whole-doc gram
      // (greatest(len-11, 2) reproduces the m = max(len-n+1, 1) clamp, and
      // DuckDB list slicing toks[i:i+12] clamps at the end like the
      // engine's slice(i, min(i+n, len)))
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(1, greatest(len(toks) - 11, 2)),
        |           i -> array_to_string(toks[i:i+12], ' ')))) AS gram
        |  FROM w),
        |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |t AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, count(*) AS n_shared_grams
        |FROM t JOIN e USING (gram)
        |GROUP BY t.doc_id
        |ORDER BY n_shared_grams DESC, doc_id
        |LIMIT 20""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS total_words,
        |       round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_mix_report" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |         CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |         CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_tokens, n_chars,
        |       round(CAST(n_tokens AS DOUBLE) /
        |             (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM cells), 6)
        |         AS token_share
        |FROM cells ORDER BY lang, source""".stripMargin,
    "q_sample_balanced" ->
      // the naive window form of balanceStrata's histogram-boundary plan:
      // same md5 key, same (hash, key) tiebreak, identical selection
      """WITH h AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh
        |  FROM documents),
        |f AS (SELECT min(cnt) AS floor_n
        |      FROM (SELECT count(*) AS cnt FROM h GROUP BY lang)),
        |r AS (SELECT lang,
        |             row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
        |      FROM h)
        |SELECT lang, count(*) AS n_docs
        |FROM r, f WHERE rk <= floor_n
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_split_assign" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    "q_length_bins" ->
      // naive single-scan form; the engine's sketch-then-map plan must
      // produce identical bins (percentile ≡ quantile_cont interpolation)
      """WITH toks AS (
        |  SELECT lang, CAST(COALESCE(length(string_split(text, ' ')), 0) AS DOUBLE) AS tok
        |  FROM documents),
        |b AS (
        |  SELECT lang, quantile_cont(tok, 0.25) AS q1,
        |         quantile_cont(tok, 0.5) AS q2, quantile_cont(tok, 0.75) AS q3
        |  FROM toks GROUP BY lang)
        |SELECT t.lang,
        |       CASE WHEN tok <= q1 THEN 0 WHEN tok <= q2 THEN 1
        |            WHEN tok <= q3 THEN 2 ELSE 3 END AS bin,
        |       count(*) AS n_docs,
        |       CAST(SUM(CAST(tok AS BIGINT)) AS BIGINT) AS bin_tokens,
        |       CAST(min(tok) AS BIGINT) AS min_tok,
        |       CAST(max(tok) AS BIGINT) AS max_tok
        |FROM toks t JOIN b USING (lang)
        |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin,
    "q_domain_cap" ->
      // naive row_number form; the engine's histogram-boundary plan must
      // produce identical cards. Verdict CTEs mirror q_source_quality;
      // NULL-text docs are verdict-kept with quality −1 (rank last, 0 nw)
      """WITH toks AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, source, text, w,
        |         list_transform(range(1, len(w) - 1),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
        |  FROM toks),
        |m AS (
        |  SELECT doc_id, source,
        |         CAST(len(w) AS INTEGER) AS n_words,
        |         floor((CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.5 +
        |                least(((CAST(length(text) AS DOUBLE) - (len(w) - 1))
        |                       / len(w)) / 10.0, 1.0) * 0.3 +
        |                least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.2)
        |               * 1e6) / 1e6 AS quality_score,
        |         CASE WHEN len(grams) > 0
        |              THEN floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                          / len(grams)) * 1e6) / 1e6
        |              ELSE 0.0 END AS dup_ratio
        |  FROM g),
        |v AS (
        |  SELECT doc_id, source,
        |         coalesce(quality_score, -1.0) AS q,
        |         CAST(coalesce(n_words, 0) AS BIGINT) AS nw
        |  FROM m
        |  WHERE concat_ws(',',
        |          CASE WHEN n_words < 12 THEN 'x' END,
        |          CASE WHEN quality_score < 0.45 THEN 'x' END,
        |          CASE WHEN dup_ratio > 0.05 THEN 'x' END) = ''),
        |r AS (
        |  SELECT source, doc_id, q, nw,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY q DESC, doc_id) AS rn
        |  FROM v)
        |SELECT source,
        |       count(*) AS n_docs,
        |       least(count(*), 15) AS n_kept,
        |       greatest(count(*) - 15, 0) AS n_dropped,
        |       CAST(coalesce(SUM(nw) FILTER (rn > 15), 0) AS BIGINT)
        |         AS tokens_dropped,
        |       MIN(q) FILTER (rn <= 15) AS q_boundary
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_shuffle_shards" ->
      // shard = first md5 hex digit / 2 — instr + floor are portable;
      // CAST(double AS INT) is not (DuckDB rounds half-away, Spark
      // truncates), hence the explicit floor on both sides
      """WITH sharded AS (
        |  SELECT doc_id, text, n_chars,
        |         md5(CAST(doc_id AS VARCHAR)) AS h,
        |         CAST(floor((instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) / 2)
        |           AS INT) AS shard
        |  FROM documents),
        |cells AS (
        |  SELECT shard, count(*) AS n_docs,
        |         CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |         arg_min(doc_id, h) AS first_doc,
        |         arg_max(doc_id, h) AS last_doc
        |  FROM sharded GROUP BY shard)
        |SELECT shard, n_docs,
        |       round(CAST(n_docs AS DOUBLE) /
        |             (SELECT CAST(SUM(n_docs) AS DOUBLE) FROM cells), 6)
        |         AS doc_share,
        |       n_tokens, n_chars, first_doc, last_doc
        |FROM cells ORDER BY shard""".stripMargin,
    "q_mix_sample" ->
      s"""SELECT lang, source, n_total, n_kept,
         |       round(CAST(n_kept AS DOUBLE) / n_total, 6) AS realized_rate,
         |       ${mixCase(kv => s"CAST(${kv._2} AS DOUBLE)", "CAST(1.0 AS DOUBLE)")} AS target_rate
         |FROM (
         |  SELECT lang, source, count(*) AS n_total,
         |         CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
         |               ${mixCase(kv => s"'${Sampling.hexThreshold(kv._2)}'", "'g'")}
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |  FROM documents GROUP BY lang, source)
         |ORDER BY lang, source""".stripMargin,
    "q_pack_sequences" ->
      // the naive single-scan prefix sum; the engine's two-phase sharded
      // scan must produce the identical packing
      """WITH toks AS (
        |  SELECT lang, doc_id,
        |         COALESCE(length(string_split(text, ' ')), 0) AS tok
        |  FROM documents),
        |pre AS (
        |  SELECT lang, doc_id, tok,
        |         COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM toks)
        |SELECT lang, CAST(floor(prefix / 2048) AS BIGINT) AS pack_id,
        |       count(*) AS n_docs,
        |       CAST(SUM(tok) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM pre GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |       length(string_split(text, ' ')) AS n_ws_tokens,
        |       length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |       CAST(n_words AS INTEGER) AS n_words,
        |       floor(uniq_ratio * 1e6) / 1e6 AS uniq_ratio,
        |       floor(avg_word_len * 1e6) / 1e6 AS avg_word_len,
        |       floor((uniq_ratio * 0.5 +
        |              least(avg_word_len / 10.0, 1.0) * 0.3 +
        |              least(n_words / 100.0, 1.0) * 0.2) * 1e6) / 1e6 AS quality_score
        |FROM (SELECT doc_id,
        |             CAST(length(string_split(text, ' ')) AS DOUBLE) AS n_words,
        |             CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |               / length(string_split(text, ' ')) AS uniq_ratio,
        |             (CAST(length(text) AS DOUBLE) - (length(string_split(text, ' ')) - 1))
        |               / length(string_split(text, ' ')) AS avg_word_len
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n,
        |             unnest(range(0, greatest(len(toks), 1), 80)) AS start FROM t)
        |SELECT doc_id, CAST(start / 80 AS INT) AS chunk_id,
        |       array_to_string(toks[start+1 : start+100], ' ') AS chunk,
        |       CAST(least(100, n - start) AS INTEGER) AS n_tokens
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q_ngram_counts" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |idx AS (
        |  SELECT doc_id, lang, w, unnest(range(1, len(w))) AS i FROM toks),
        |counts AS (
        |  SELECT lang, w[i] || ' ' || w[i+1] AS gram,
        |         count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |  FROM idx GROUP BY 1, 2)
        |SELECT lang, rank, gram, n_occurrences, n_docs
        |FROM (SELECT lang, gram, n_occurrences, n_docs,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY n_occurrences DESC, gram) AS rank
        |      FROM counts)
        |WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |         list_transform(range(1, len(w) - 1),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
        |  FROM toks)
        |SELECT doc_id, lang, n_grams, n_distinct, dup_ratio,
        |       dup_ratio > 0.1 AS flagged
        |FROM (SELECT doc_id, lang,
        |             len(grams) AS n_grams,
        |             len(list_distinct(grams)) AS n_distinct,
        |             CASE WHEN len(grams) > 0
        |                  THEN floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                              / len(grams)) * 1e6) / 1e6
        |                  ELSE 0.0 END AS dup_ratio
        |      FROM g)
        |ORDER BY doc_id""".stripMargin,
    "q_source_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, source, text, w,
        |         list_transform(range(1, len(w) - 1),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
        |  FROM toks),
        |m AS (
        |  SELECT doc_id, source,
        |         CAST(len(w) AS INTEGER) AS n_words,
        |         floor((CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.5 +
        |                least(((CAST(length(text) AS DOUBLE) - (len(w) - 1))
        |                       / len(w)) / 10.0, 1.0) * 0.3 +
        |                least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.2)
        |               * 1e6) / 1e6 AS quality_score,
        |         CASE WHEN len(grams) > 0
        |              THEN floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                          / len(grams)) * 1e6) / 1e6
        |              ELSE 0.0 END AS dup_ratio
        |  FROM g),
        |v AS (
        |  -- keep via non-firing reasons (NOT a threshold conjunction): a
        |  -- NULL-text doc has NULL n_words/quality, which fires no reason
        |  -- and stays kept — the conjunction form would make keep NULL
        |  SELECT source, quality_score, dup_ratio,
        |         concat_ws(',',
        |           CASE WHEN n_words < 12 THEN 'x' END,
        |           CASE WHEN quality_score < 0.45 THEN 'x' END,
        |           CASE WHEN dup_ratio > 0.05 THEN 'x' END) = '' AS keep
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |       round(CAST(count(*) FILTER (keep) AS DOUBLE) / count(*), 6)
        |         AS keep_rate,
        |       round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
        |             / count(*), 6) AS avg_quality,
        |       round(CAST(SUM(CAST(dup_ratio AS DECIMAL(18,6))) AS DOUBLE)
        |             / count(*), 6) AS avg_dup
        |FROM v GROUP BY source ORDER BY source""".stripMargin,
    "q_corpus_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, lang, text, w,
        |         list_transform(range(1, len(w) - 1),
        |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
        |  FROM toks),
        |m AS (
        |  SELECT doc_id, lang,
        |         CAST(len(w) AS INTEGER) AS n_words,
        |         floor((CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 0.5 +
        |                least(((CAST(length(text) AS DOUBLE) - (len(w) - 1))
        |                       / len(w)) / 10.0, 1.0) * 0.3 +
        |                least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.2)
        |               * 1e6) / 1e6 AS quality_score,
        |         CASE WHEN len(grams) > 0
        |              THEN floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |                          / len(grams)) * 1e6) / 1e6
        |              ELSE 0.0 END AS dup_ratio
        |  FROM g),
        |r AS (
        |  SELECT doc_id, lang, n_words, quality_score, dup_ratio,
        |         concat_ws(',',
        |           CASE WHEN n_words < 12 THEN 'too_short' END,
        |           CASE WHEN quality_score < 0.45 THEN 'low_quality' END,
        |           CASE WHEN dup_ratio > 0.05 THEN 'repetitive' END) AS reasons
        |  FROM m)
        |SELECT doc_id, lang, n_words, quality_score, dup_ratio, reasons,
        |       reasons = '' AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tf AS (SELECT lang, token, count(*) AS tf FROM toks GROUP BY lang, token)
        |SELECT lang, rank, token, round(raw_score, 6) AS tfidf
        |FROM (SELECT lang, token,
        |             tf * ln(CAST(n_docs AS DOUBLE) / df) AS raw_score,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, token)
        |               AS rank
        |      FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin,
    "q_lm_quality" ->
      // naive per-occurrence form; the engine's RLE plan must score
      // identically. lp is rounded-then-DECIMAL on both sides so the
      // per-doc sum is exact and order-insensitive.
      """WITH occ AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS cnt FROM occ GROUP BY token),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |lp AS (
        |  SELECT token,
        |         CAST(round(ln(CAST(cnt AS DOUBLE) / tot), 6)
        |           AS DECIMAL(18,6)) AS lp
        |  FROM vocab CROSS JOIN tot),
        |dt AS (SELECT doc_id, token, count(*) AS c FROM occ
        |       GROUP BY doc_id, token)
        |SELECT doc_id, n_tokens,
        |       round(CAST(lpsum AS DOUBLE) / n_tokens, 6) AS avg_logp
        |FROM (SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
        |             SUM(dt.c * lp.lp) AS lpsum
        |      FROM dt JOIN lp USING (token) GROUP BY dt.doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_source_drift" ->
      // naive per-occurrence form; terms rounded-then-DECIMAL so the
      // per-source KL sum is order-insensitive on both engines
      """WITH st AS (
        |  SELECT source, token, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY source, token),
        |tok AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM st GROUP BY token),
        |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens FROM st GROUP BY source),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM st)
        |SELECT source, n_tokens, round(CAST(kl AS DOUBLE), 6) AS kl_vs_corpus
        |FROM (
        |  SELECT st.source, ns.n_tokens,
        |         SUM(CAST(round(
        |           (CAST(st.c AS DOUBLE) / ns.n_tokens) *
        |           ln((CAST(st.c AS DOUBLE) / ns.n_tokens) /
        |              (CAST(tok.ct AS DOUBLE) / nt.nt)), 9)
        |           AS DECIMAL(28,9))) AS kl
        |  FROM st JOIN tok USING (token) JOIN ns USING (source) CROSS JOIN nt
        |  GROUP BY st.source, ns.n_tokens)
        |ORDER BY source""".stripMargin,
    "q_topic_terms" ->
      // lift computed double-rounded BEFORE the rank so the row_number
      // boundary compares the values the output shows; token tiebreak
      """WITH st AS (
        |  SELECT source, token, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY source, token),
        |tok AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM st GROUP BY token),
        |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens FROM st GROUP BY source),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM st),
        |lifts AS (
        |  SELECT st.source, st.token, st.c,
        |         round((CAST(st.c AS DOUBLE) / ns.n_tokens) /
        |               (CAST(tok.ct AS DOUBLE) / nt.nt), 6) AS lift
        |  FROM st JOIN tok USING (token) JOIN ns USING (source) CROSS JOIN nt)
        |SELECT source, rank, token, c, lift
        |FROM (SELECT source, token, c, lift,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY lift DESC, token) AS rank
        |      FROM lifts)
        |WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    "q_boilerplate" ->
      // shingle = non-overlapping full 50-token window; tail fragments
      // dropped on BOTH engines so the hash universe is identical
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id, source, toks, len(toks) AS n FROM t WHERE len(toks) >= 50),
        |st AS (
        |  SELECT doc_id, source, toks,
        |         unnest(range(0, n - 49, 50)) AS s FROM f),
        |sh AS (
        |  SELECT doc_id, source,
        |         md5(array_to_string(toks[s+1 : s+50], ' ')) AS h FROM st),
        |pc AS (
        |  SELECT h, source, doc_id, count(*) AS n_occ FROM sh GROUP BY 1, 2, 3),
        |dp AS (SELECT h, count(*) AS n_docs FROM pc GROUP BY h)
        |SELECT pc.source,
        |       CAST(SUM(pc.n_occ) AS BIGINT) AS n_shingles,
        |       CAST(SUM(pc.n_occ * (CASE WHEN dp.n_docs >= 2 THEN 1 ELSE 0 END))
        |            AS BIGINT) AS n_dup_shingles,
        |       count(DISTINCT pc.h) AS n_passages,
        |       count(DISTINCT CASE WHEN dp.n_docs >= 2 THEN pc.h END)
        |         AS n_dup_passages,
        |       round(CAST(SUM(pc.n_occ * (CASE WHEN dp.n_docs >= 2 THEN 1 ELSE 0 END))
        |                  AS DOUBLE) /
        |             CAST(SUM(pc.n_occ) AS DOUBLE), 6) AS dup_ratio
        |FROM pc JOIN dp USING (h)
        |GROUP BY pc.source ORDER BY pc.source""".stripMargin,
    "q_embed_dim_stats" ->
      // per-dim x and x² sums route through DECIMAL so the aggregation
      // order cannot wobble mean/std at the 6th decimal
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |idx AS (SELECT v, unnest(range(1, len(v)+1)) AS i FROM e),
        |t AS (SELECT i AS dim, v[i] AS x FROM idx)
        |SELECT dim, count(*) AS n,
        |       round(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) /
        |             count(*), 6) AS mean,
        |       round(sqrt(greatest(
        |         CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE) / count(*) -
        |         pow(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) /
        |             count(*), 2),
        |         0.0)), 6) AS std,
        |       round(min(x), 6) AS min_x, round(max(x), 6) AS max_x,
        |       round(CAST(SUM(CASE WHEN abs(x) < 1e-6 THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 6) AS frac_nearzero
        |FROM t GROUP BY dim ORDER BY dim""".stripMargin,
    "q_sim_ann_int8" ->
      // replicate the quantized pipeline, not just the answer: stage 1
      // scores round(x/scale)*scale dequantized vectors (bit-identical to
      // tinyint*scale), stage 2 re-ranks the 50 candidates exactly
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv0 FROM e WHERE vec_id = 0),
        |s AS (
        |  SELECT vec_id, v,
        |         (CASE WHEN m = 0 THEN 1.0 ELSE m END) AS scale
        |  FROM (SELECT vec_id, v,
        |          list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127
        |            AS m
        |        FROM e)),
        |cand AS (
        |  SELECT s.vec_id,
        |         round(list_cosine_similarity(
        |           list_transform(s.v, x -> round(x / s.scale) * s.scale),
        |           q.qv0), 6) AS asim
        |  FROM s, q WHERE s.vec_id <> 0
        |  ORDER BY asim DESC, s.vec_id ASC LIMIT 50)
        |SELECT e.vec_id,
        |       round(list_cosine_similarity(e.v, q.qv0), 6) AS sim
        |FROM e JOIN cand USING (vec_id), q
        |ORDER BY sim DESC, e.vec_id ASC LIMIT 10""".stripMargin,
    "q_sim_ann_int8_batch" ->
      // the q_sim_ann_int8 two-stage pipeline, K queries at once: same
      // quantized stage-1 arithmetic, per-qid pools, exact re-rank
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |s AS (
        |  SELECT vec_id, v,
        |         (CASE WHEN m = 0 THEN 1.0 ELSE m END) AS scale
        |  FROM (SELECT vec_id, v,
        |          list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127
        |            AS m
        |        FROM e)),
        |cand AS (
        |  SELECT q.qid, s.vec_id,
        |         round(list_cosine_similarity(
        |           list_transform(s.v, x -> round(x / s.scale) * s.scale),
        |           q.qv), 6) AS asim
        |  FROM s CROSS JOIN q WHERE s.vec_id >= 5),
        |pool AS (
        |  SELECT qid, vec_id
        |  FROM (SELECT qid, vec_id,
        |               row_number() OVER (PARTITION BY qid
        |                 ORDER BY asim DESC, vec_id ASC) AS pr
        |        FROM cand)
        |  WHERE pr <= 50)
        |SELECT qid, rank, vec_id, sim
        |FROM (SELECT p.qid, e.vec_id,
        |             round(list_cosine_similarity(e.v, q.qv), 6) AS sim,
        |             row_number() OVER (PARTITION BY p.qid
        |               ORDER BY round(list_cosine_similarity(e.v, q.qv), 6)
        |                 DESC, e.vec_id ASC) AS rank
        |      FROM pool p JOIN e USING (vec_id) JOIN q ON p.qid = q.qid)
        |WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,
    "q_top_passages" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 50),
        |st AS (
        |  SELECT doc_id, toks, unnest(range(0, n - 49, 50)) AS s FROM f),
        |sh AS (
        |  SELECT doc_id,
        |         md5(array_to_string(toks[s+1 : s+50], ' ')) AS h,
        |         array_to_string(toks[s+1 : s+8], ' ') AS preview FROM st),
        |pc AS (
        |  SELECT h, doc_id, count(*) AS n_occ, min(preview) AS preview
        |  FROM sh GROUP BY 1, 2)
        |SELECT h, count(*) AS n_docs, CAST(SUM(n_occ) AS BIGINT) AS n_occ,
        |       min(preview) AS preview
        |FROM pc GROUP BY h HAVING count(*) >= 2
        |ORDER BY n_docs DESC, h LIMIT 20""".stripMargin,
    "q_embed_outliers" ->
      // centroid = DECIMAL-exact per-(label,dim) sum cast to DOUBLE, then
      // one IEEE division — identical in both engines; distance terms
      // route through DECIMAL so the 64-term sum is order-insensitive
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |t AS (
        |  SELECT vec_id, label, unnest(v) AS x,
        |         unnest(range(1, len(v) + 1)) AS i
        |  FROM e),
        |cent AS (
        |  SELECT label, i,
        |         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
        |  FROM t GROUP BY label, i),
        |d AS (
        |  SELECT t.vec_id, t.label,
        |         round(sqrt(CAST(SUM(CAST((t.x - c.m) * (t.x - c.m)
        |                                  AS DECIMAL(28,12))) AS DOUBLE)), 6)
        |           AS dist
        |  FROM t JOIN cent c ON t.label = c.label AND t.i = c.i
        |  GROUP BY t.vec_id, t.label)
        |SELECT vec_id, label, dist FROM d
        |ORDER BY dist DESC, vec_id ASC LIMIT 20""".stripMargin,
    "q_quantize_embed" ->
      // per-vector element sums route through DECIMAL so SUM order over
      // the unnested elements cannot wobble the 6th decimal
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, label, v,
        |         list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127 AS scale
        |  FROM e),
        |t AS (SELECT vec_id, label, scale, unnest(v) AS x FROM s),
        |pv AS (
        |  SELECT vec_id, label,
        |         round(sqrt(
        |           CAST(SUM(CAST(pow(x - round(x / scale) * scale, 2)
        |                         AS DECIMAL(28,12))) AS DOUBLE) /
        |           CAST(SUM(CAST(pow(x, 2) AS DECIMAL(28,12))) AS DOUBLE)), 6)
        |           AS rel_err
        |  FROM t GROUP BY vec_id, label, scale)
        |SELECT label, count(*) AS n_vecs,
        |       round(CAST(SUM(CAST(rel_err AS DECIMAL(18,6))) AS DOUBLE) /
        |             count(*), 6) AS avg_rel_err,
        |       round(max(rel_err), 6) AS max_rel_err
        |FROM pv GROUP BY label ORDER BY label""".stripMargin,
    "q_lm_filter" ->
      // CAST(1 AS DOUBLE)/3: force IEEE double quantile fractions —
      // DuckDB's bare 1.0/3 is DECIMAL division and lands a different
      // boundary than Spark's double 1/3
      """WITH occ AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS cnt FROM occ GROUP BY token),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM vocab),
        |lp AS (
        |  SELECT token,
        |         CAST(round(ln(CAST(cnt AS DOUBLE) / tot), 6)
        |           AS DECIMAL(18,6)) AS lp
        |  FROM vocab CROSS JOIN tot),
        |dt AS (SELECT doc_id, lang, token, count(*) AS c FROM occ
        |       GROUP BY doc_id, lang, token),
        |scored AS (
        |  SELECT doc_id, lang, n_tokens,
        |         round(CAST(lpsum AS DOUBLE) / n_tokens, 6) AS avg_logp
        |  FROM (SELECT dt.doc_id, dt.lang,
        |               CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
        |               SUM(dt.c * lp.lp) AS lpsum
        |        FROM dt JOIN lp USING (token) GROUP BY dt.doc_id, dt.lang)),
        |b AS (
        |  SELECT lang,
        |         quantile_cont(avg_logp, CAST(1 AS DOUBLE)/3) AS q1,
        |         quantile_cont(avg_logp, CAST(2 AS DOUBLE)/3) AS q2
        |  FROM scored GROUP BY lang)
        |SELECT s.lang,
        |       CASE WHEN avg_logp <= q1 THEN 'tail'
        |            WHEN avg_logp <= q2 THEN 'middle'
        |            ELSE 'head' END AS bucket,
        |       count(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens,
        |       min(avg_logp) AS min_score,
        |       max(avg_logp) AS max_score
        |FROM scored s JOIN b USING (lang)
        |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "q_set_ops" ->
      """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'both' AS cohort, count(*) AS n_users
        |FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
        |UNION ALL
        |SELECT 'click_only', count(*)
        |FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
        |UNION ALL
        |SELECT 'purchase_only', count(*)
        |FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
        |ORDER BY cohort""".stripMargin,
    "q_metric_summary" ->
      """WITH recent AS (
        |  SELECT user_id FROM (
        |    SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id
        |    ORDER BY last_ts DESC, user_id ASC LIMIT 20) t)
        |SELECT e.user_id, e.event_type,
        |       max(e.event_id) AS last_event_id,
        |       max_by(e.value, e.event_id) AS last_value,
        |       count(*) AS n_points
        |FROM events e JOIN recent ON e.user_id = recent.user_id
        |GROUP BY e.user_id, e.event_type
        |ORDER BY e.user_id, e.event_type""".stripMargin,
    "q_lag_delta" ->
      """SELECT event_id, user_id, event_type, value,
        |       round(value - lag(value) OVER (PARTITION BY user_id, event_type
        |             ORDER BY ts, event_id), 6) AS delta
        |FROM events WHERE user_id <= 50
        |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """SELECT s.event_id AS event_id, s.user_id AS user_id,
        |       count(c.event_id) AS n_clicks_1h
        |FROM events s LEFT JOIN events c
        |  ON c.user_id = s.user_id AND c.event_type = 'click'
        | AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 1 HOUR
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id, s.user_id
        |ORDER BY s.event_id""".stripMargin,
    "q_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_window_analytics" ->
      """SELECT event_id, event_type, value,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(c.user_id, v.user_id) AS user_id, click_total, view_total
        |FROM (SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |        AS click_total
        |      FROM events WHERE event_type = 'click' GROUP BY user_id) c
        |FULL OUTER JOIN
        |     (SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |        AS view_total
        |      FROM events WHERE event_type = 'view' GROUP BY user_id) v
        |ON c.user_id = v.user_id
        |ORDER BY user_id""".stripMargin,
    "q_exists_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "q_correlated_scalar" ->
      """SELECT user_id, event_type, value AS last_value
        |FROM events e
        |WHERE event_id = (SELECT max(event_id) FROM events e2
        |                  WHERE e2.user_id = e.user_id
        |                    AND e2.event_type = e.event_type)
        |ORDER BY user_id, event_type""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    // regex literals are the RE2-safe subset TextAnalysis.{EmailRe,Ipv4Re,
    // LongNumRe} so Java regex (Spark) and RE2 (DuckDB) agree; DuckDB
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    // Counts are PROGRESSIVE (emails on raw, IPs on post-email, digit runs
    // on post-IP) so each count equals the placeholders actually emitted —
    // same staging as TextAnalysis.redact.
    "q_pii_card" ->
      // same progressive counting as q_text_redact: IPs counted after
      // emails are masked, digit runs after IPs — no double counting
      """WITH staged AS (
        |  SELECT source,
        |    len(regexp_extract_all(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
        |    len(regexp_extract_all(
        |        regexp_replace(text,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
        |    len(regexp_extract_all(
        |        regexp_replace(
        |          regexp_replace(text,
        |            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |            '<EMAIL>', 'g'),
        |          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |        '\d{6,}')) AS nn
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM(CASE WHEN ne + ni + nn > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_with_pii,
        |  CAST(SUM(COALESCE(ne, 0)) AS BIGINT) AS n_emails,
        |  CAST(SUM(COALESCE(ni, 0)) AS BIGINT) AS n_ips,
        |  CAST(SUM(COALESCE(nn, 0)) AS BIGINT) AS n_longnums,
        |  round(CAST(SUM(CASE WHEN ne + ni + nn > 0 THEN 1 ELSE 0 END)
        |             AS DOUBLE) / count(*), 6) AS frac_docs_with_pii
        |FROM staged GROUP BY source ORDER BY source""".stripMargin,
    "q_text_redact" ->
      """WITH staged AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
        |      AS after_email,
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS after_ip
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(after_email, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(after_ip, '\d{6,}')) AS n_longnums,
        |  sha256(regexp_replace(after_ip, '\d{6,}', '<NUM>', 'g')) AS clean_sha
        |FROM staged ORDER BY doc_id""".stripMargin,
  )
}
