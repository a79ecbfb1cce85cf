package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import graft.operators.{Relational, Similarity}

/** Physical-plan assertions: the scale properties (pushdown, pruning,
  * broadcast, top-k) are part of each operator's contract, not an accident
  * of the current optimizer mood. If one of these fails, a plan regressed.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Force the over-threshold regime (both the static planner threshold
    * and AQE's runtime one) for the duration of `body` — how every
    * "degrades to a keyed shuffle join at 100× scale" pin simulates the
    * corpus outgrowing the broadcast limit. */
  private def withBroadcastDisabled[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("filterEq pushes both equality predicates into the parquet scan") {
    val p = plan(Relational.filterEq(spark, sf))
    assert(p.contains("EqualTo(o_orderstatus,F)"))
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"))
  }

  test("pointLookup pushes the key predicate (index-probe analog)") {
    val p = plan(Relational.pointLookup(spark, sf))
    assert(p.contains("EqualTo(o_orderkey,42)"))
  }

  test("joinAgg broadcasts both dimension sides and prunes the fact scan") {
    // NO hints in the operator (r14 verdict #1): at bench scale the
    // planner's own size estimate (orders.parquet ≪ autoBroadcastJoinThreshold)
    // must still pick both broadcasts — this pin proves the hint removal
    // cost nothing in the regime where broadcast is right.
    val p = plan(Relational.joinAgg(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "both dimension joins must be broadcast — no fact-table shuffle")
    assert(!p.contains("SortMergeJoin"))
    // lineitem scan reads only the 3 needed columns
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"))
  }

  test("joinAgg over the broadcast threshold degrades to keyed shuffle joins") {
    // at ~100× scale orders/customer no longer fit the 8 GB broadcast limit;
    // the scaladoc's claim (Relational.joinAgg) is that the SAME declarative
    // plan then degrades to keyed sort-merge/shuffled-hash joins whose
    // exchanges carry only the pruned columns — not a nested loop, and not a
    // forced broadcast that would hard-fail the job. Force the regime and
    // pin the shape, exactly as antijoinAbsent does.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.joinAgg(spark, sf)
      val p = plan(df)
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size >= 2,
        s"over-threshold joins must be keyed shuffle joins, plan was:\n${p.take(2000)}")
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "no broadcast may survive with the threshold disabled")
      // the o_orderstatus filter stays pushed below the join, at the scan
      assert(p.contains("EqualTo(o_orderstatus,F)"),
        "status filter must stay pushed into the orders scan under SMJ")
      // exchanges stay narrow: each scan reads only the needed columns
      assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
        "lineitem scan must stay pruned to 3 columns under SMJ")
      assert(p.contains("struct<c_custkey:bigint,c_mktsegment:string>"),
        "customer scan must stay pruned to 2 columns under SMJ")
      // and the answer is identical to the broadcast regime's
      val smjRows = df.collect()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
      val bhjRows = Relational.joinAgg(spark, sf).collect()
      assert(smjRows.toSeq == bhjRows.toSeq,
        "both regimes must return the identical 5-segment card")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("card finals sort locally — no range exchange, no sampling pass") {
    // Present.cardSort contract: a bounded answer (group-key domain /
    // top-k geometry) is totally ordered by a single-partition local
    // sort. A global orderBy here would plan rangepartitioning, whose
    // bounds come from a SEPARATE sampling job — two extra scheduler
    // round-trips of pure floor per card query.
    for ((name, df) <- Seq(
        "q_join_agg" -> Relational.joinAgg(spark, sf),
        "q_rollup_revenue" -> Relational.rollupRevenue(spark, sf),
        "q_profile_events" -> graft.operators.Analytics.profileEvents(spark, sf),
        "q_text_stats" -> graft.operators.TextAnalysis.textStats(spark, sf),
        "q_sim_topk_batch" -> Similarity.simBatchTopK(spark, sf),
        "q_ngram_counts" -> graft.operators.TextAnalysis.ngramCounts(spark, sf))) {
      val p = plan(df)
      assert(!p.toLowerCase.contains("rangepartitioning"),
        s"$name: card final must not range-exchange:\n${p.take(1500)}")
      assert(p.contains("Sort "), s"$name: the card must still be totally ordered")
      assert(p.contains("Coalesce"),
        s"$name: the local sort must run over ONE partition to be a total order")
    }
    // the window-shaped call sites are safe ONLY because WindowGroupLimit
    // bounds the data before the Coalesce(1); if the rank<=k stops
    // rewriting (e.g. rank over a non-rewritable expression), a
    // corpus-sized window would collapse into one task — pin the rewrite
    for ((name, df) <- Seq(
        "q_sim_topk_batch" -> Similarity.simBatchTopK(spark, sf),
        "q_ngram_counts" -> graft.operators.TextAnalysis.ngramCounts(spark, sf))) {
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"),
        s"$name: per-group top-k must group-limit before the coalesced final")
    }
  }

  test("antijoinAbsent is a broadcast anti-join") {
    val p = plan(Relational.antijoinAbsent(spark, sf))
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("LeftAnti BuildRight"))
  }

  test("deleteCascade broadcasts the victim set at bench scale, degrades keyed past the threshold") {
    // r16 self-audit: victims is a distinct USER set — corpus-growing —
    // so the operator carries no hint; this pins that the declarative
    // plan still broadcasts in the regime where broadcast is right...
    val df = graft.operators.Tracking.deleteCascade(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("LeftAnti BuildRight"),
      s"bench-scale victim set must broadcast:\n${p.take(1500)}")
    // ...and that past the threshold it degrades to a user-keyed shuffle
    // anti-join with the predicate still pushed to the victims scan
    val base = df.collect().toSeq
    withBroadcastDisabled {
      val over = graft.operators.Tracking.deleteCascade(spark, sf)
      val po = plan(over)
      assert("SortMergeJoin.*LeftAnti|ShuffledHashJoin.*LeftAnti".r.findFirstIn(po).nonEmpty,
        s"over-threshold anti-join must be keyed, plan:\n${po.take(2000)}")
      assert(!po.contains("BroadcastHashJoin") && !po.contains("BroadcastNestedLoopJoin"))
      assert(po.contains("EqualTo(event_type,error)"),
        "victim predicate must stay pushed into the scan under the keyed regime")
      assert(over.collect().toSeq == base,
        "both regimes must return the identical survivor set")
    }
  }

  test("antijoinAbsent over the broadcast threshold degrades to a keyed SMJ anti-join") {
    // at 100 TB the lineitem key set cannot broadcast (the sf0.1 build of
    // the hash set is already 600 k keys, ×3.4 under 10× data) — the
    // scaladoc's claim is that past the threshold the SAME declarative plan
    // degrades to a sort-merge anti-join shuffling only (key) rows, not a
    // nested loop and not a payload-carrying exchange. Force the
    // over-threshold regime and pin that shape.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.antijoinAbsent(spark, sf)
      val p = plan(df)
      assert(p.contains("SortMergeJoin LeftAnti") ||
        (p.contains("SortMergeJoin") && p.contains("LeftAnti")),
        s"over-threshold anti-join must be sort-merge, plan was:\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "anti-join must stay keyed — never a nested loop")
      // the probe side shuffles ONLY the join key: a single-column scan
      assert(p.contains("struct<l_orderkey:bigint>"),
        "lineitem scan must be pruned to the key column")
      // and the answer is identical to the broadcast regime's
      assert(df.count() ==
        { spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
          Relational.antijoinAbsent(spark, sf).count() })
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("listSortLimit is top-k (TakeOrderedAndProject), not a global sort") {
    val p = plan(Relational.listSortLimit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("lastPerGroup is a hash aggregate with map-side partials, no window sort") {
    val p = plan(Relational.lastPerGroup(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Window"))
  }

  test("bucketed tables join with zero shuffle (co-located SMJ)") {
    import spark.implicits._
    // warehouse.dir is static config — default ./spark-warehouse is fine
    // (gitignored); force a shuffle-join regime so only bucketing can
    // remove the exchange
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1L to 1000L).map(i => (i, s"n$i")).toDF("k", "name")
        .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("dim_b")
      (1L to 5000L).map(i => (i % 1000 + 1, i.toDouble)).toDF("k", "v")
        .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("fact_b")
      val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n${p.take(2000)}")
      assert(joined.count() == 5000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS dim_b")
      spark.sql("DROP TABLE IF EXISTS fact_b")
    }
  }

  test("simTopK broadcasts the query vector") {
    val p = plan(Similarity.simTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("rangeJoin keeps the equi key — never a nested-loop cross product") {
    val p = plan(graft.operators.Analytics.rangeJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range predicate must ride the user_id equi-join as a filter")
  }

  test("metricSummary semi-joins the fact against the broadcast top-20 card") {
    // the recency card is a session artifact (recent_entities_20): the
    // steady-state plan joins its checkpoint leaf — the fact table is
    // scanned exactly ONCE per summary probe, and the 20-row card side
    // broadcasts
    val p = plan(graft.operators.Analytics.metricSummary(spark, sf))
    assert(p.contains("BroadcastExchange"))
    assert(p.contains("ExistingRDD"), "expected the checkpointed recency-card leaf")
    assert("events\\.parquet".r.findAllIn(p).size == 1,
      "steady state must scan the fact table once, not rebuild the card")
    // the card's own build stays top-k (TakeOrdered to 20 rows), never a
    // global sort — pinned on the build plan the artifact checkpoints
    import org.apache.spark.sql.functions.{asc, desc, max}
    val build = plan(graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(max("ts").as("last_ts"))
      .orderBy(desc("last_ts"), asc("user_id")).limit(20).select("user_id"))
    assert(build.contains("TakeOrderedAndProject"), "top-20 recency must be top-k")
  }

  test("correlatedScalar decorrelates to aggregate + join (no per-row subquery)") {
    val p = plan(graft.operators.Analytics.correlatedScalar(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"), "expected the decorrelated max aggregate")
  }

  test("simAnnIvf probes the materialized inverted file — statically pruned, no re-assignment") {
    val p = plan(Similarity.simAnnIvf(spark, sf))
    // the round-4 weak: every query recomputed the full-corpus coarse
    // assignment (16 cosines/row). The probe plan must contain NO argmax
    // assignment at all — assignment is ingest-time work in AnnIndex.
    assert(!p.contains("array_max(transform"),
      "probe plan must not re-assign the corpus to clusters")
    // since r17 probe selection is driver math over the cached codebook
    // (AnnIndex.probedCells — the queryBands discipline applied to raw
    // IVF), so the probed cells are LITERAL predicates: static pruning
    // at planning time, no DPP subquery, no pivot-scan broadcast, and
    // the whole probe is one TakeOrdered job over the pruned cells
    val partFilters = p.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(l => l.contains("cluster") &&
      (l.contains("IN (") || l.contains("INSET"))),
      s"inverted-file scan must statically prune on cluster; got $partFilters")
    assert(!p.contains("dynamicpruningexpression"),
      "static literal pruning should make a DPP subquery unnecessary")
    assert(p.contains("graft_ann"), "probe must read the materialized index")
    assert(!p.contains("embeddings.parquet"),
      "query vector rides as a literal from the driver cache — no 1-row " +
        "corpus scan per probe")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 via per-partition heaps over the pruned cells")
  }

  test("ivfPq candidate scan is statically partition-pruned and never re-encodes the corpus") {
    val p = plan(Similarity.ivfPqCandidates(spark, sf))
    // encoding is ingest-time work (AnnIndex.ensureIvfPq); a probe that
    // contains pq_encode or a coarse re-assignment is rebuilding the
    // index per query — the 100 TB anti-pattern
    assert(!p.contains("pq_encode"),
      "candidate plan must not re-encode the corpus")
    assert(!p.contains("array_max(transform"),
      "candidate plan must not re-assign the corpus to cells")
    // probe selection is driver math over the cached codebook, so the
    // probed cells are LITERAL predicates on the partition column —
    // static pruning at planning time, no probe join or DPP subquery
    val partFilters = p.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(l => l.contains("cluster") &&
      (l.contains("IN (") || l.contains("INSET"))),
      s"code-store scan must statically prune on cluster; got $partFilters")
    assert(!p.contains("dynamicpruningexpression"),
      "static literal pruning should make a DPP subquery unnecessary")
    assert(p.contains("graft_ann"), "probe must read the materialized index")
    assert(p.contains("pq_adc"), "candidates must be ADC-scored codes")
  }

  test("batched ivfPq candidate scan: one statically-pruned scan, broadcast fans, no DPP") {
    val ver = graft.operators.AnnIndex.corpusVersion(spark, sf)
    val qvs = graft.operators.AnnIndex.queryVectors(
      spark, sf, 0L until Similarity.BatchQueries.toLong, ver)
    val p = plan(Similarity.ivfPqBatchCandidates(spark, sf, ver, qvs))
    assert(!p.contains("pq_encode"), "must not re-encode the corpus")
    assert(!p.contains("array_max(transform"), "must not re-assign cells")
    val partFilters = p.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(l => l.contains("cluster") &&
      (l.contains("IN (") || l.contains("INSET"))),
      s"scan must statically prune to the probed-cell union; got $partFilters")
    assert(!p.contains("dynamicpruningexpression"), "no DPP subquery needed")
    assert(!p.contains("SortMergeJoin"),
      "probe fan and LUT attach must broadcast, never shuffle the scan")
    assert(p.contains("pq_adc") && p.contains("WindowGroupLimit"),
      "ADC scoring + per-qid pool must survive optimization")
  }

  test("batched int8 candidate scan: one store scan, broadcast fan, group-limited pools") {
    val ver = graft.operators.AnnIndex.corpusVersion(spark, sf)
    val qvs = graft.operators.AnnIndex.queryVectors(
      spark, sf, 0L until Similarity.BatchQueries.toLong, ver)
    val p = plan(Similarity.int8BatchCandidates(spark, sf, ver, qvs))
    assert(p.contains("graft_ann"), "must read the materialized int8 store")
    assert(!p.contains("embeddings.parquet"),
      "candidate stage never touches the f32 corpus")
    assert(!p.contains("array_max(transform"),
      "must read stored codes, not re-quantize the corpus")
    assert(!p.contains("SortMergeJoin"),
      "the K-query fan must broadcast, never shuffle the store scan")
    assert(p.contains("WindowGroupLimit"),
      "per-qid pools must group-limit map-side before the exchange")
  }

  test("batched re-rank colocation is regime-adaptive: coalesced card small, qid exchange big") {
    // small regime (default bound ≫ any fixture corpus): coalesce(1)'s
    // SinglePartition satisfies the per-qid window with ZERO exchange —
    // the r17 diet shape, byte-pinned by ShuffleAuditSpec
    val small = plan(Similarity.simAnnInt8Batch(spark, sf))
    assert(small.contains("Coalesce"),
      "small regime must window on the coalesced card")
    assert(!small.contains("hashpartitioning(qid"),
      "small regime must not exchange the re-rank")
    val smallRows = Similarity.simAnnInt8Batch(spark, sf).collect().toSeq
    // forced big regime: coalesce(1) is a NARROW dependency that would
    // serialize the In()-pushed point-fetch SCAN into one task (corpus-
    // sized footer walk at 100 TB — r17 ADVICE); past the bound the
    // card-sized survivors exchange ONCE by qid instead and the window
    // plans on that hash partitioning with no further exchange
    spark.conf.set("spark.graft.ann.singleTaskScanRows", "0")
    try {
      val big = plan(Similarity.simAnnInt8Batch(spark, sf))
      // the qid exchange is the stage boundary that keeps the scan
      // parallel; cardSort's own coalesce(1) sits ABOVE it, so its narrow
      // dependency stops at the shuffle and never reaches the scan
      assert(big.contains("hashpartitioning(qid"),
        s"big regime must exchange the survivors by qid:\n$big")
      // same answer in both regimes (cardSort fixes presentation order)
      assert(Similarity.simAnnInt8Batch(spark, sf).collect().toSeq == smallRows,
        "regimes must agree on the served card")
    } finally spark.conf.unset("spark.graft.ann.singleTaskScanRows")
  }

  test("simAnnLsh probes the materialized index — partition-pruned, no hyperplane fold") {
    // r17: the candidate-id set is a session artifact, so the pruned
    // band scan lives in the BUILD plan (pinned here) and the
    // steady-state probe reads its checkpoint leaf (pinned below)
    val ver = graft.operators.AnnIndex.corpusVersion(spark, sf)
    val b = plan(graft.operators.Similarity.lshCandidates(spark, sf, ver))
    // corpus signatures are computed once per corpus version
    // (AnnIndex.ensureLsh); a build that contains the hyperplane fold is
    // recomputing the index per query — the 100 TB anti-pattern
    assert(!b.contains("hyperplane_bits"),
      "candidate build must not recompute corpus signatures")
    assert(b.contains("graft_ann"), "build must read the materialized on-disk index")
    // the query's bucket coordinates are LITERAL predicates on the
    // (band_id, band_grp) partition columns — static pruning to the
    // probed GROUP dirs (round 7 filtered on vec_id, a data column, and
    // full-scanned all 64 directories twice) — and the bucket key itself
    // must reach the parquet scan as a PUSHED filter so the sorted group
    // file prunes by row-group stats (r17 group-dir format)
    val partFilters = b.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(l => l.contains("band_id") && l.contains("band_grp")),
      s"band scan must prune on (band_id, band_grp); PartitionFilters: $partFilters")
    assert(b.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("band_key")),
      "band_key equality must push into the group-file scan")
    val p = plan(graft.operators.Similarity.simAnnLsh(spark, sf))
    assert(p.contains("ExistingRDD"),
      "steady-state probe must read the candidate artifact's checkpoint leaf")
    assert(!p.contains("graft_ann"),
      "the pruned band scan is artifact-build work, not per-probe work")
    // payload fetch for candidates is a broadcast join over the corpus
    // scan, never a shuffle of the corpus
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      "exact re-rank keeps per-partition heaps")
  }

  test("balanceStrata never windows over the bare strata column") {
    val df = graft.operators.Sampling.balanceStrata(
      graft.sources.Tables.documents(spark, sf), "lang", "doc_id")
    val p = plan(df)
    // every Window must partition by (strata, bucket) — a window keyed by
    // the 5-value lang column alone is the whole-corpus-in-5-reducers skew
    val windowArgs = p.linesIterator.filter(_.contains("Arguments: [row_number()"))
    windowArgs.foreach { l =>
      assert(l.contains("__b"), s"window not bucket-partitioned: $l")
    }
    assert(p.contains("BroadcastExchange"), "boundary must broadcast back")
  }

  test("domainCap ranks only the boundary sliver, never a whole source") {
    val df = graft.operators.Sampling.domainCap(spark, sf)
    val p = plan(df)
    // the only row_number window is the boundary tie-break; its input must
    // be the broadcast boundary join (≤1 row per source fans the corpus
    // down to one quality value's docs), never the bare kept corpus — a
    // source-partitioned rank over the corpus is |sources| reducers
    // owning 100 TB
    val rn = p.linesIterator.filter(_.contains("Arguments: [row_number()"))
    assert(rn.nonEmpty, "tie-break rank window missing")
    assert(p.contains("BroadcastExchange"),
      "boundary rows must broadcast back onto the verdict scan")
    // the cumulative window runs over the histogram aggregate only: every
    // window sits above a HashAggregate or below the boundary broadcast
    // join — no window may consume the raw documents scan directly
    assert(!p.contains("SortMergeJoin"),
      "all joins here are broadcast (boundary rows, card-sized frames)")
  }

  test("packSequences: corpus-width prefix window is shard-partitioned, offsets broadcast") {
    val df = graft.operators.Sampling.packSequences(spark, sf)
    val p = plan(df)
    // the full-width running sum must partition by (lang, shard) — a
    // running sum keyed by the 5-value lang alone is the
    // whole-corpus-in-5-reducers skew the two-phase scan exists to avoid.
    // The offsets window (lang-only) is legal: it runs over the
    // shard-count-sized aggregate, below the broadcast join.
    p.linesIterator.filter(l =>
      l.contains("Window") && l.contains("windowspecdefinition(lang") &&
        !l.contains("shard")).foreach { l =>
      assert(l.contains("shard_tok"),
        s"corpus-width window not shard-partitioned: $l")
    }
    assert(p.contains("BroadcastHashJoin"), "shard offsets must broadcast back")
  }

  test("fitsBroadcast follows the session threshold, unit strings and -1 included") {
    import graft.operators.Present
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
      assert(Present.fitsBroadcast(spark, 1024L * 1024))
      assert(!Present.fitsBroadcast(spark, 1024L * 1024 + 1))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!Present.fitsBroadcast(spark, 1L),
        "disabled threshold must disable every guarded forced hint too")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("domainCap over the broadcast threshold degrades to source-keyed shuffle joins") {
    // boundary/tie are ≤1 row per source and sources grow with the corpus
    // (web domains) — past the limit the guard must drop the hints AND the
    // single-partition card sort (answer-sized no longer holds), keeping a
    // global source sort instead
    val base = graft.operators.Sampling.domainCap(spark, sf, 7).collect().toSeq
    withBroadcastDisabled {
      val df = graft.operators.Sampling.domainCap(spark, sf, 7)
      val p = plan(df)
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).nonEmpty,
        s"over-threshold card joins must be keyed:\n${p.take(2000)}")
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
      assert(df.collect().toSeq == base,
        "both regimes must produce the identical per-source card")
    }
  }

  test("packSequences over the broadcast threshold degrades to a keyed shuffle join") {
    // the offsets frame grows ∝ docs/shardSize — past the broadcast limit
    // the regime guard (Present.fitsBroadcast) must swap the forced
    // broadcast for a (lang, shard)-keyed shuffle join and keep the
    // offsets prefix window on its natural per-lang hash exchange
    val base = graft.operators.Sampling.packSequences(spark, sf).collect().toSeq
    withBroadcastDisabled {
      val df = graft.operators.Sampling.packSequences(spark, sf)
      val p = plan(df)
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).nonEmpty,
        s"over-threshold offsets join must be a keyed shuffle join:\n${p.take(2000)}")
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "no broadcast may survive with the threshold disabled")
      // the corpus-width running sum must STILL partition by (lang, shard)
      p.linesIterator.filter(l =>
        l.contains("Window") && l.contains("windowspecdefinition(lang") &&
          !l.contains("shard")).foreach { l =>
        assert(l.contains("shard_tok"),
          s"corpus-width window not shard-partitioned under shuffle regime: $l")
      }
      assert(df.collect().toSeq == base,
        "both regimes must produce the identical packing manifest")
    }
  }

  test("dedupSimhashPairs never re-evaluates the fingerprint fold (no HOF in plan)") {
    val p = plan(graft.operators.Dedup.dedupSimhashPairs(spark, sf))
    // the fingerprint frame is a localCheckpoint artifact, so the compiled
    // pair-search plan must reference a leaf RDD — if `aggregate(zip_with`
    // reappears anywhere (worst case: inside a scan-level Filter via
    // InferFiltersFromConstraints pushdown), the barrier regressed and the
    // fold runs serially at the scan, 4× over
    assert(!p.contains("aggregate(zip_with"),
      "simhash fold leaked into the pair-search plan — pushdown barrier lost")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "expected the checkpointed fingerprint leaf")
  }

  test("corpusMix: one corpus scan, share total via card window — no broadcast jobs") {
    val p = plan(graft.operators.TextAnalysis.corpusMix(spark, sf))
    // the denominator is a single-partition window over the bounded
    // mixture-cell card (≤ langs × sources rows) — no checkpoint, no
    // re-aggregation, no broadcast subtree below the one corpus aggregate
    assert(p.contains("Window"), "share total must ride a card window")
    assert(!p.contains("Join"), "no broadcast join-back for the total")
    // exactly one scan of documents.parquet
    assert("documents\\.parquet".r.findAllIn(p).size <= 1,
      "corpus total must derive from the cell aggregate, not a second scan")
  }

  test("lengthBins assigns bins map-side from broadcast percentile boundaries") {
    val p = plan(graft.operators.Sampling.lengthBins(spark, sf))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "quartile boundaries must broadcast back for map-side assignment")
    assert(!p.contains("Window"),
      "binning must never rank the corpus — the |langs|-reducer sort skew")
    assert(!p.contains("SortMergeJoin"))
  }

  test("minmaxScale joins broadcast bounds — no whole-partition window") {
    val p = plan(graft.operators.Tracking.minmaxScale(spark, sf))
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("Window"), "bounds must come from an aggregate, not a window")
  }

  test("sourceQuality carries source on the verdict row — no corpus self-join") {
    val p = plan(graft.operators.TextAnalysis.sourceQuality(spark, sf))
    assert(!p.contains("Join"),
      "the source column must ride the map-only verdict row, never re-join")
    // the rollup probes the session verdict artifact — the corpus is
    // scanned once at artifact build, never per consumer query
    assert(!p.contains("documents.parquet"),
      "rollup must read the cached verdict frame, not re-scan the corpus")
  }

  test("verdict-family consumers probe the artifact — zero corpus scans each") {
    Seq(
      "corpusFilter" -> graft.operators.TextAnalysis.corpusFilter(spark, sf),
      "domainCap" -> graft.operators.Sampling.domainCap(spark, sf),
      "domainCapKeep" -> graft.operators.Sampling.domainCapKeep(spark, sf)
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("documents.parquet"),
        s"$name must read the cached verdict frame, not re-scan the corpus")
    }
  }

  test("artifact size gate: past maxRows the corpus-row-sized artifacts score inline, same answers") {
    import graft.operators.TextAnalysis
    // cached mode first (default ceiling) — also the answer baseline
    val cachedAnswers = Seq(
      "textLangId" -> TextAnalysis.textLangId(spark, sf),
      "lmQuality" -> TextAnalysis.lmQuality(spark, sf),
      "decontaminate" -> TextAnalysis.decontaminate(spark, sf),
      "corpusFilter" -> TextAnalysis.corpusFilter(spark, sf),
      "packSequences" -> graft.operators.Sampling.packSequences(spark, sf),
      "dedupSimhash" -> graft.operators.Dedup.dedupSimhash(spark, sf),
      "dedupClusters" -> graft.operators.Dedup.dedupClusters(spark, sf)
    ).map { case (n, df) => n -> df.collect().toSeq }.toMap
    // gate engaged: a tiny ceiling forces the langid_scored / lm_scores /
    // filter_verdicts artifacts (and pack_sequences' size-gated offsets
    // card) back to INLINE scoring — the plan must carry the documents
    // scan again (no pinned O(corpus) checkpoint leaf), and every answer
    // must be identical to the cached mode's
    spark.conf.set("spark.graft.artifact.maxRows", "10")
    try {
      Seq(
        "textLangId" -> (() => TextAnalysis.textLangId(spark, sf)),
        "lmQuality" -> (() => TextAnalysis.lmQuality(spark, sf)),
        "decontaminate" -> (() => TextAnalysis.decontaminate(spark, sf)),
        "corpusFilter" -> (() => TextAnalysis.corpusFilter(spark, sf)),
        "packSequences" -> (() => graft.operators.Sampling.packSequences(spark, sf))
      ).foreach { case (name, mk) =>
        val df = mk()
        assert(plan(df).contains("documents.parquet"),
          s"$name past the ceiling must plan the inline documents scan")
        assert(df.collect().toSeq == cachedAnswers(name),
          s"$name must answer identically in inline and cached modes")
      }
      // packSequences scans documents once even in cached mode (the
      // packing pass itself); past the ceiling the offsets build must
      // come back inline as a SECOND scan instead of a checkpoint leaf
      assert("documents\\.parquet".r
        .findAllIn(plan(graft.operators.Sampling.packSequences(spark, sf)))
        .size == 2,
        "gated packSequences must plan the inline offsets scan alongside the packing scan")
      // the BARRIER family (simhash fps / near-dup labels / band store)
      // degrades to a per-query transient checkpoint, never a raw inline
      // build: the fingerprint query's plan must still be a leaf — the
      // simhash64 fold pushing into the scan is the 1.2→3.3 s regression
      // the barrier exists to prevent
      val gatedSimhash = graft.operators.Dedup.dedupSimhash(spark, sf)
      val pSim = plan(gatedSimhash)
      // "simhash64(" = the fold EXPRESSION (the output column is legally
      // named simhash64 — only the call form means the barrier fell)
      assert(pSim.contains("ExistingRDD") && !pSim.contains("simhash64("),
        "gated simhash fps must stay behind a transient checkpoint barrier")
      assert(gatedSimhash.collect().toSeq == cachedAnswers("dedupSimhash"),
        "dedupSimhash must answer identically in transient and cached modes")
      assert(graft.operators.Dedup.dedupClusters(spark, sf).collect().toSeq ==
        cachedAnswers("dedupClusters"),
        "dedupClusters must answer identically in transient and cached modes")
    } finally spark.conf.unset("spark.graft.artifact.maxRows")
  }

  test("clusterProfile steady state rolls up the cached (cell × label) card — zero embeddings scans") {
    // warm the artifact, then pin the steady-state shape: the per-query
    // plan must be the card-sized rollup over the checkpointed cells
    // frame — no embeddings scan, no assignment argmax re-run
    Similarity.clusterProfile(spark, sf).collect()
    val p = plan(Similarity.clusterProfile(spark, sf))
    assert(!p.contains("embeddings.parquet"),
      "steady state must read the cached (cell × label) card, not re-scan the corpus")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "expected the checkpointed card leaf")
  }

  test("pair-artifact consumers serve TakeOrdered off the cached pair set — zero corpus scans") {
    // all four heavy pair searches (minhash/simhash/ngram since r13,
    // embed since r16) are session artifacts: the steady-state query must
    // be a bounded TakeOrdered over the checkpointed pair frame, never a
    // re-run of the shingle/fingerprint/gram/banding pipeline
    Seq(
      ("dedupMinhash", "documents.parquet",
        graft.operators.Dedup.dedupMinhash(spark, sf)),
      ("dedupSimhashPairs", "documents.parquet",
        graft.operators.Dedup.dedupSimhashPairs(spark, sf)),
      ("dedupNgram", "documents.parquet",
        graft.operators.Dedup.dedupNgram(spark, sf)),
      ("dedupEmbed", "embeddings.parquet",
        graft.operators.Dedup.dedupEmbed(spark, sf))
    ).foreach { case (name, corpusFile, df) =>
      val p = plan(df)
      assert(!p.contains(corpusFile),
        s"$name steady state must read the cached pair artifact, not re-scan the corpus")
      assert(p.contains("TakeOrderedAndProject"),
        s"$name top-20 must plan as TakeOrdered over the artifact")
    }
  }

  test("ngramCounts top-k is two-phase: bucket-local rank before the per-lang rank") {
    val p = plan(graft.operators.TextAnalysis.ngramCounts(spark, sf))
    assert("row_number".r.findAllIn(p).size >= 2,
      "bucket-local row_number must precede the global per-lang rank — " +
        "a single per-lang window funnels the vocabulary through one reducer")
    assert(p.contains("bucket"), "phase 1 partitions by (lang, gram-hash bucket)")
  }

  test("heavyHitters: top-20 is TakeOrdered over the checkpointed counts, total broadcasts") {
    val p = plan(graft.operators.Analytics.heavyHitters(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be per-partition heaps, not a global sort of the key set")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the 1-row total must broadcast")
    // both consumers read the materialized counts, not the fact table
    assert(!p.contains("events.parquet") ||
      "events\\.parquet".r.findAllIn(p).size <= 1,
      "fact table must be scanned at most once (checkpointed counts)")
  }

  test("simBatchTopK group-limits map-side — the K-way fan never reaches the exchange whole") {
    val p = plan(Similarity.simBatchTopK(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      "row_number<=10 must rewrite to a partial group-limit so each " +
        "partition ships ≤ K·10 rows, not the scanned corpus ×K")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the K-row query frame must broadcast")
    assert(!p.contains("SortMergeJoin"), "no corpus shuffle join")
  }

  test("simAnnBatch prunes the index to the probed-cell union — one batched job") {
    val p = plan(Similarity.simAnnBatch(spark, sf))
    assert(!p.contains("array_max(transform"),
      "probe plan must not re-assign the corpus to clusters")
    // r17: cell selection for ALL K queries is driver math (cached
    // codebook × cached query vectors), so the scan statically prunes to
    // the probed-cell UNION — no K×k broadcast product, no DPP subquery
    val partFilters = p.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partFilters.exists(l => l.contains("cluster") &&
      (l.contains("IN (") || l.contains("INSET"))),
      s"scan must statically prune to the probed-cell union; got $partFilters")
    assert(!p.contains("dynamicpruningexpression"), "no DPP subquery needed")
    assert(p.contains("graft_ann"), "probe must read the materialized index")
    assert(p.contains("WindowGroupLimit"), "per-qid top-10 group-limits map-side")
    assert(!p.contains("SortMergeJoin"))
  }

  test("clusterProfile's card BUILD assigns map-side from broadcast codebook — no vector shuffle join") {
    // the build seam behind the r14 session artifact (the cached consumer
    // reads a checkpoint leaf — its own zero-scan pin is below)
    val p = plan(Similarity.clusterCellsBuild(spark, sf))
    assert(!p.contains("SortMergeJoin"),
      "vector payloads must never shuffle for a join")
    assert("Broadcast(NestedLoop|Hash)Join".r.findAllIn(p).size >= 2,
      "1-row codebook cross join + broadcast centroid join")
  }

  test("shuffleShards: one corpus scan — the share total is a card window") {
    val p = plan(graft.operators.Sampling.shuffleShards(spark, sf))
    assert(!p.contains("documents.parquet") ||
      "documents\\.parquet".r.findAllIn(p).size <= 1,
      "doc_share's denominator must derive from the NShards-row card, not the corpus")
    // the denominator is a single-partition window over the NShards-row
    // card — no checkpoint, re-aggregation, or broadcast job below the
    // one corpus aggregate
    assert(p.contains("Window"), "share total must ride a card window")
    assert(!p.contains("Join"), "no broadcast join-back for the total")
  }

  test("knnLabel retrieval group-limits map-side like simBatchTopK") {
    val p = plan(Similarity.knnLabel(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      "neighbor top-10 must keep per-partition heaps off the exchange")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the K-row query frame must broadcast")
    assert(!p.contains("SortMergeJoin"), "no corpus shuffle join")
  }

  test("lmFilter buckets map-side from the materialized score table") {
    val p = plan(graft.operators.TextAnalysis.lmFilter(spark, sf))
    assert(!p.contains("documents.parquet"),
      "both consumers must read the checkpointed score table — the corpus " +
        "passes happen once, at materialization")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "tercile boundaries must broadcast back for map-side assignment")
    assert(!p.contains("Window"),
      "bucketing must never rank the corpus — boundaries come from one " +
        "percentile aggregate")
    assert(!p.contains("SortMergeJoin"))
  }

  test("lm score builder: RLE both passes, broadcast log-prob join, no occurrence shuffle") {
    val p = plan(graft.operators.TextAnalysis.lmScoredBuild(spark, sf))
    assert(p.contains("ngram_hashes"),
      "scoring pass must run the native per-doc RLE, not an explode+groupBy " +
        "of raw occurrences")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the vocabulary log-prob table must broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join on token")
    // two corpus passes BY CONSTRUCTION (train the LM, then score);
    // the vocab side is checkpointed so nothing triples
    assert("documents\\.parquet".r.findAllIn(p).size <= 2,
      "only the two deliberate passes may appear")
  }

  test("lm score builder over the broadcast threshold degrades to a token-keyed shuffle join") {
    // a Heaps-law vocabulary at 100 TB outgrows the broadcast limit; the
    // regime guard must swap the forced lp broadcast for a token-keyed
    // shuffle join (the 1-row total frame stays a forced broadcast — a
    // card-sized frame is always legal)
    val base = graft.operators.TextAnalysis.lmScoredBuild(spark, sf)
      .orderBy("doc_id").collect().toSeq
    withBroadcastDisabled {
      val df = graft.operators.TextAnalysis.lmScoredBuild(spark, sf)
      val p = plan(df)
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).nonEmpty,
        s"over-threshold token join must be a keyed shuffle join:\n${p.take(2000)}")
      assert(!p.contains("BroadcastHashJoin"),
        "the vocabulary log-prob table must not broadcast past the threshold")
      assert(df.orderBy("doc_id").collect().toSeq == base,
        "both regimes must produce identical per-doc scores")
    }
  }

  test("lmQuality reads the session score artifact — no corpus scan per query") {
    val p = plan(graft.operators.TextAnalysis.lmQuality(spark, sf))
    assert(!p.contains("documents.parquet"),
      "the per-query plan must read the cached score table; the corpus " +
        "passes happen once per (session, corpus version)")
  }

  test("topicTerms reuses the source-token artifact and plans a group-limit") {
    // warm the shared artifact (sourceDrift and topicTerms read the same one)
    graft.operators.TextAnalysis.sourceDrift(spark, sf).collect()
    val p = plan(graft.operators.TextAnalysis.topicTerms(spark, sf))
    assert(!p.contains("documents.parquet"),
      "the ranking runs over the cached vocabulary-sized count table")
    assert(p.contains("WindowGroupLimit"),
      "rank <= 5 must push a per-partition local top-5 below the exchange")
  }

  test("boilerplate family shares the passage artifact; warm path never rescans docs") {
    // cold calls build the checkpointed (hash, source, doc) shingle table
    // AND (r19) the per-source/top-20 CARD artifacts derived from it —
    // the 500k decade measured the per-call card re-aggregation at
    // 101 MB of shuffle, so a warm card read is now an artifact probe
    graft.operators.TextAnalysis.boilerplate(spark, sf).collect()
    graft.operators.TextAnalysis.topPassages(spark, sf).collect()
    val p = plan(graft.operators.TextAnalysis.boilerplate(spark, sf))
    assert(!p.contains("documents.parquet"),
      "warm path must not rescan the corpus")
    assert(p.contains("ExistingRDD"),
      "warm card read = a probe of the checkpointed card artifact")
    assert(!p.contains("HashAggregate"),
      "warm card read must not re-aggregate the shingle table " +
        "(presentation sort only)")
    val tp = plan(graft.operators.TextAnalysis.topPassages(spark, sf))
    assert(!tp.contains("documents.parquet"),
      "the companion card is its own 20-row artifact — zero corpus work")
    assert(tp.contains("ExistingRDD") && !tp.contains("HashAggregate"),
      "warm top-20 = a probe of the checkpointed 20-row artifact")
  }

  test("dedupIncremental probes the warm band store without re-shingling the corpus") {
    // warm the store, then pin: the corpus bands must come from the
    // checkpointed artifact (an ExistingRDD scan), not a rebuild — the
    // batch scan and candidate doc-fetch are the only parquet work.
    // (The static plan repeats the batch lineage per consumer; AQE
    // stage reuse collapses those at runtime, as in minhashPairsBuild.)
    graft.operators.Dedup.dedupIncremental(spark, sf).collect()
    val p = plan(graft.operators.Dedup.dedupIncremental(spark, sf))
    assert(p.contains("ExistingRDD"),
      "warm probe must read the corpus band store from the session artifact")
  }

  test("simAnnInt8 re-rank pushes the candidate ids into the f32 scan") {
    val p = plan(graft.operators.Similarity.simAnnInt8(spark, sf))
    assert(p.contains("In(vec_id"),
      "the 50 candidate ids must reach the parquet scan as a pushed filter " +
        "so the re-rank reads candidate row groups, not the corpus")
  }

  test("pooled ANN probes: steady state is the one In()-pushed re-rank — no store scan") {
    // r17 stage diet: the candidate job runs once per (corpus version,
    // conf) via AnnIndex.candidatePool; a warm probe must not rescan the
    // int8/PQ stores — its whole plan is the exact re-rank over the
    // pooled candidate ids
    val probes = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("simAnnPq", () => graft.operators.Similarity.simAnnPq(spark, sf)),
      ("simAnnIvfPq", () => graft.operators.Similarity.simAnnIvfPq(spark, sf)),
      ("simAnnInt8Batch", () => graft.operators.Similarity.simAnnInt8Batch(spark, sf)),
      ("simAnnIvfPqBatch", () => graft.operators.Similarity.simAnnIvfPqBatch(spark, sf)))
    probes.foreach { case (name, f) =>
      f().collect() // populate the pool
      val p = plan(f())
      assert(p.contains("In(vec_id"),
        s"$name: pooled candidate ids must reach the f32 scan as a pushed filter")
      assert(!p.contains("graft_ann"),
        s"$name: warm probe must re-rank the pooled candidates, not rescan the store")
    }
    // the batched re-ranks are card-sized (≤ K·pool rows): the per-qid
    // window runs on one coalesced partition, no hash exchange at all
    val pb = plan(graft.operators.Similarity.simAnnInt8Batch(spark, sf))
    assert(!pb.contains("Exchange hashpartitioning"),
      "batched re-rank must window on the coalesced card, not exchange it")
  }

  test("embedOutliers: broadcast centroid card, top-20 as TakeOrdered, no corpus shuffle join") {
    val p = plan(Similarity.embedOutliers(spark, sf))
    // the labels×64 centroid card joins back by broadcast; a sort-merge
    // join here would shuffle the corpus on label — 5 reducers at 100 TB
    assert(p.contains("BroadcastHashJoin"), "centroid card must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle on label")
    // global top-20 via per-partition heaps, never a full sort
    assert(p.contains("TakeOrderedAndProject"))
    // the distance is computed inside the row: the per-query plan must
    // not posexplode at all — the (label, pos) centroid fan lives in the
    // session-cached centroid build, not in the probe
    assert(!p.contains("posexplode"),
      "the centroid pass is a session artifact; the probe must not fan")
    assert("embeddings\\.parquet".r.findAllIn(p).size <= 1,
      "one corpus scan — the centroid side reads the cached card")
  }

  test("dupInflation: two hash aggregates, no window, no sort before the histogram") {
    val p = plan(graft.operators.Dedup.dupInflation(spark, sf))
    // cluster sizes then histogram — both as hash aggregates with
    // map-side partials; a Window or global Sort before the final
    // order-by would be a corpus-sized single-reducer stage
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Window"), "histogram must not use a window")
    assert("TakeOrderedAndProject|Sort ".r.findAllIn(p).size <= 1,
      "only the final card-sized order-by may sort")
  }

  test("tierAdvisor steady state is a local scan — no parquet reads at all") {
    val p = plan(graft.operators.Similarity.tierAdvisor(spark, sf))
    assert(!p.toLowerCase.contains("parquet"),
      s"the tier card is driver math over cached stats; plan scans:\n${p.take(1500)}")
    assert(p.contains("LocalTableScan"), p.take(1500))
  }

  test("annRecall steady state reads the cached 5-row card — no probes, no scans") {
    graft.operators.Similarity.annRecall(spark, sf).collect() // build once
    val p = plan(graft.operators.Similarity.annRecall(spark, sf))
    assert(!p.toLowerCase.contains("parquet"),
      s"steady-state recall card must not re-run the probe subtrees:\n${p.take(1500)}")
  }

  test("indexHealth build reads only the index artifacts; steady state reads the card") {
    val ver = graft.operators.AnnIndex.corpusVersion(spark, sf)
    val b = plan(graft.operators.Similarity.indexHealthBuild(spark, sf, ver))
    assert(b.contains("graft_ann"), "build must scan the materialized indexes")
    assert(!b.contains("embeddings.parquet"),
      "the card aggregates index keys; the corpus is never rescanned")
    graft.operators.Similarity.indexHealth(spark, sf).collect() // build once
    val p = plan(graft.operators.Similarity.indexHealth(spark, sf))
    assert(!p.toLowerCase.contains("parquet"),
      s"steady-state health card must not re-scan the index families:\n${p.take(1500)}")
  }

  test("jsonExtract's fenced parse-filter stays above the spread exchange") {
    // the predicate embeds the JSON parse; unfenced, PushDownPredicates
    // drags it through spread's repartition into the lone scan task and
    // the parse re-serializes (r17 decomposition: 0.41 s pushed vs 0.17 s
    // fenced at sf0.1 — DevJsonProbe, OptimizerFence scaladoc)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Repartition}
    val qe = graft.operators.Tracking.jsonExtract(spark, sf).queryExecution
    val fenced = qe.optimizedPlan.collect {
      case f: LFilter if f.condition.toString.contains("opt_fence") => f
    }
    assert(fenced.nonEmpty,
      s"the fence must survive optimization:\n${qe.optimizedPlan.treeString.take(1200)}")
    assert(fenced.exists(_.child.exists(_.isInstanceOf[Repartition])),
      "the fenced filter must sit ABOVE the parallelizing repartition, " +
        s"not below it:\n${qe.optimizedPlan.treeString.take(1200)}")
  }

  test("opt_fence is value-transparent: fenced rows equal the pushed-down formulation's") {
    import org.apache.spark.sql.functions._
    val unfenced = graft.sources.Tables.spread(graft.sources.Tables.events(spark, sf))
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .where(col("k") > 50)
      .select("event_id", "user_id", "k")
      .orderBy("event_id")
    val fenced = graft.operators.Tracking.jsonExtract(spark, sf)
    assert(fenced.collect().toSeq == unfenced.collect().toSeq)
  }

  test("opt_fence refuses a genuinely nondeterministic child") {
    import org.apache.spark.sql.functions.expr
    val e = intercept[Throwable] {
      spark.range(1).select(expr("opt_fence(rand() > 0.5)")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("deterministic"))),
      s"expected the constructor's determinism require, got: $e")
  }
}
