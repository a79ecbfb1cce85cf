package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.{SessionCache, Tables}

/** Sampling operators for training-data curation (class balancing, corpus
  * downsampling) — deterministic by construction: membership is a pure
  * function of a row's own key hash, never of partitioning, task order, or
  * an RNG stream, so a sample is reproducible across runs, retries, and
  * cluster layouts (unlike `df.sample`, whose draw depends on row order
  * within partitions).
  */
object Sampling {

  /** [[packSequences]] broadcast-estimate envelope: offsets rows =
    * populated (lang, shard) pairs ≤ shards × languages. Languages aren't
    * counted (that would cost a corpus scan); 8192 over-covers the full
    * ISO 639-3 code space (~7,900 assigned codes — the r16 value of 512
    * only covered 639-1 and could UNDERestimate, the one unsafe
    * direction), and overestimating only moves the broadcast→shuffle
    * crossover earlier — the safe direction. */
  private val PackLangEnvelope = 8192L

  /** Broadcast bytes per offsets row (lang string + 2 longs + hash-relation
    * entry overhead), priced conservatively. */
  private val PackOffsetRowBytes = 64L


  /** Keep ~`fraction` of rows, decided by the key's hash bucket:
    * xxhash64(key, seed) mod 1e6 < fraction·1e6. Same key ⇒ same verdict
    * in every run and on every replica — which also makes the sample
    * stable under re-partitioning and incremental reruns.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame =
    df.where(
      pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L)) <
        (fraction * 1000000L).toLong)

  /** Per-stratum fractions (e.g. downsample the dominant language):
    * unspecified strata keep everything.
    */
  def stratifiedSample(
      df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Int): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.where(
      pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L)).cast("double") <
        frac * 1000000.0)
  }

  /** Deterministic class-balanced corpus: cap every stratum at the size of
    * the smallest one, keeping the lowest key-hashes (a stable choice, not
    * an arbitrary head).
    *
    * Scale: selection is histogram-driven, NOT a whole-stratum sort. A
    * whole-stratum `row_number` window would sort the entire corpus inside
    * |strata| partitions (5 languages ⇒ 5 reducers own 100 TB — maximal
    * skew). Instead:
    *   1. one map-side aggregate builds a (stratum × 4096 coarse hash
    *      buckets) histogram — bucket ids are monotone in signed-hash
    *      order, so per-stratum cumulative counts locate the single
    *      bucket containing the floor_n-th smallest hash exactly;
    *   2. that boundary (one row per stratum) broadcasts back: rows in
    *      buckets below it pass with no ranking at all, and only rows
    *      inside the boundary bucket (≈ stratum/4096 of the data) get an
    *      exact (hash, key) rank — the window partitions by
    *      (stratum, bucket), so no reducer ever holds more than one
    *      bucket's sliver.
    * Output is identical to the naive form: exactly the floor_n lowest
    * (hash, key) rows per stratum, deterministic and partition-independent.
    *
    * Key choice: md5 hex of the key (the [[splitOf]] idiom), NOT xxhash64 —
    * both are deterministic pure key functions, but md5 exists in DuckDB
    * with the identical lowercase-hex encoding, so the selection (and the
    * `q_sample_balanced` card) is oracle-expressible and hash-checked
    * end-to-end instead of rows-only. Ordering on the fixed-width hex
    * string equals unsigned byte order of the digest; the first 3 hex
    * chars give the same 4096-bucket histogram the old bit-shift did.
    */
  def balanceStrata(df: DataFrame, strataCol: String, keyCol: String): DataFrame =
    balanceStrata(df, strataCol, keyCol, strataBoundary(df, strataCol, keyCol))

  /** The boundary card [[balanceStrata]] broadcasts back — EXACTLY one row
    * per stratum: the histogram bucket holding the floor_n-th smallest
    * hash plus how many of that bucket's rows still fit. Split out so a
    * corpus-keyed caller ([[sampleDocuments]]) can pin it as a session
    * artifact: it is a pure function of (corpus, strataCol, keyCol), its
    * build is the only whole-corpus aggregate in the balanced sample, and
    * every probe of the same corpus version re-derives the identical card.
    */
  private[graft] def strataBoundary(
      df: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    val hash = md5(col(keyCol).cast("string"))
    val bucket = substring(hash, 1, 3)
    val withB = df.withColumn("__h", hash).withColumn("__b", bucket)

    // histogram-sized from here down (≤ |strata| × 4096 rows, REGARDLESS
    // of corpus size) — so the per-stratum totals, the global floor, and
    // the cumulative counts all ride window sums over ONE coalesced
    // partition of the histogram (SinglePartition satisfies every window's
    // clustering requirement, so no exchange and no re-aggregation +
    // broadcast jobs exist below the agg; the bounded-frame argument is
    // the same one Present.cardSort makes). The corpus itself is
    // aggregated exactly once.
    val wCum = Window.partitionBy(strataCol).orderBy("__b")
    withB
      .groupBy(col(strataCol), col("__b")).agg(count(lit(1)).as("__c"))
      .coalesce(1)
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(Window.partitionBy(strataCol)))
      .withColumn("__floor_n", min("__n").over(Window.partitionBy()))
      .where(col("__cum") - col("__c") < col("__floor_n") &&
        col("__cum") >= col("__floor_n"))
      .select(col(strataCol).as("__s"), col("__b").as("__bb"),
        (col("__floor_n") - (col("__cum") - col("__c"))).as("__take"))
  }

  /** [[balanceStrata]] with the boundary card supplied by the caller
    * (freshly derived or a session artifact — same values either way). */
  private[graft] def balanceStrata(
      df: DataFrame, strataCol: String, keyCol: String,
      boundary: DataFrame): DataFrame = {
    val hash = md5(col(keyCol).cast("string"))
    val bucket = substring(hash, 1, 3)
    val withB = df.withColumn("__h", hash).withColumn("__b", bucket)

    // the sliver discipline (r19 verdict #2, q_domain_cap's shape): rows
    // STRICTLY below the boundary bucket pass unconditionally — ranking
    // them is wasted exchange (the old form shuffled O(kept) key rows per
    // call; only ~1/4096 of them could ever consult their rank). So the
    // window sees ONLY the boundary-bucket sliver; the passthrough half
    // is map-only. Output is provably identical: the window partitions by
    // (stratum, bucket), so restricting its input to one bucket per
    // stratum cannot change any rank inside that bucket, and non-boundary
    // rows never read __rk (BalanceSliverSpec pins sliver ≡ whole-window).
    val wEdge = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(keyCol))
    // null-safe equality: a NULL stratum is a stratum of its own (the
    // histogram and the windows already group it as one) — plain === would
    // silently drop every null-stratum row at this join
    val joined = withB.join(broadcast(boundary), col(strataCol) <=> col("__s"))
    val keepCols = df.columns.map(col)
    val below = joined.where(col("__b") < col("__bb")).select(keepCols: _*)
    val sliver = joined.where(col("__b") === col("__bb"))
      .withColumn("__rk", row_number().over(wEdge))
      .where(col("__rk") <= col("__take"))
      .select(keepCols: _*)
    below.unionAll(sliver)
  }

  /** Deterministic sampled corpus view over `documents` — oracle-checked:
    * the md5 selection key makes the exact member set expressible as a
    * DuckDB window query, so the per-language card is hash-matched, not
    * rows-only (plus the invariants SamplingAggSpec pins).
    *
    * The boundary card (≤ 1 row per language) is a session artifact keyed
    * on the corpus fingerprint: its build is the balanced sample's only
    * whole-corpus aggregate, so caching it halves the corpus scans of
    * every subsequent probe at any data size — the capHist / verdictFrame
    * discipline. Correctness is unchanged (the card is a pure function of
    * the corpus; a mutated dir fingerprints to a fresh artifact).
    */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame = {
    // cache probe FIRST, table resolutions AFTER (build-side inside the
    // block): the probe's supersession check invalidates the catalog's
    // pinned listing on mutation — a docs frame resolved before it would
    // capture the pre-mutation file set (the dedupEmbed discipline;
    // SamplingAggSpec pins the mutation round trip)
    val boundary = SessionCache.cached(
      spark, "balance_boundary_lang_doc_id", dir,
      SessionCache.dirFingerprint(spark, dir))(
      strataBoundary(Tables.documents(spark, dir), "lang", "doc_id"))
    balanceStrata(Tables.documents(spark, dir), "lang", "doc_id", boundary)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .transform(Present.cardSort(_, col("lang")))
  }

  /** Deterministic train/val/test assignment — the split every training
    * pipeline needs, as a pure function of the row key so it is stable
    * across runs, engines, and repartitioning (the reason md5-prefix
    * bucketing is the industry idiom): bucket = first two hex chars of
    * md5(doc_id), train < 0xcc (≈80%), val < 0xe6 (≈10%), test rest.
    * A doc can never migrate between splits when the corpus grows —
    * membership depends on its own id only, the property random splits
    * lack and the one that prevents eval contamination over time.
    * Output is the per-split audit profile (doc count, exact char volume,
    * language spread).
    * Scale: map-side hash + one 3-group aggregate; no shuffle of payload.
    * Oracle-portable: md5 hex and substring compare identically in DuckDB.
    */
  /** The train/val/test membership of a `doc_id` column — the pure key
    * function behind [[splitAssign]], exposed so a pipeline can apply the
    * split to any (possibly curated) frame.
    */
  private[graft] def splitOf: org.apache.spark.sql.Column = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    when(bucket < "cc", "train")
      .when(bucket < "e6", "val")
      .otherwise("test")
  }

  def splitAssign(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("split", splitOf)
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"), // exact integer sum, order-free
        countDistinct("lang").as("n_langs"))
      .transform(Present.cardSort(_, col("split")))
  }

  /** Length-curriculum binning — assign every document to a per-language
    * token-length quartile (the bucketed-batching / curriculum-schedule
    * step: short-sequence bins pad less and warm up training, long bins
    * stress context) and emit the per-(lang, bin) accounting a data
    * loader's batch sampler consumes.
    *
    * Scale: the naive form ranks each language's docs by length — a
    * whole-corpus sort owned by |langs| reducers (the skew balanceStrata
    * and packSequences refuse). Here the bin BOUNDARIES come from one
    * exact `percentile` aggregate (map-side partials, one row per lang),
    * broadcast back; bin assignment is then a map-side comparison — the
    * sketch-then-map shape, so no corpus-sized shuffle exists beyond the
    * final mixture-cell aggregate. At 100 TB swap the exact percentile
    * for `percentile_approx` without touching the plan shape.
    * Determinism: Spark `percentile` and DuckDB `quantile_cont` both
    * linearly interpolate (the q_quantiles equivalence), token counts are
    * exact ints, and edges compare as doubles — the binning hashes
    * identically in both engines.
    */
  def lengthBins(spark: SparkSession, dir: String): DataFrame = {
    // def, not val: the token projection must resolve its documents scan
    // at each USE site — the build inside the artifact block, the binning
    // pass after the cache probe's supersession check has invalidated any
    // pre-mutation catalog listing (the dedupEmbed probes-first discipline)
    def toks = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        coalesce(size(split(col("text"), " ")), lit(0)).cast("double").as("tok"))
    // the quartile-edge card (≤ 1 row per language) is a session artifact:
    // its exact-percentile build is one of this query's two corpus scans,
    // and the edges are a pure function of the corpus — every probe of the
    // same corpus version shares one build (the strataBoundary discipline)
    val bounds = SessionCache.cached(spark, "length_bins_bounds", dir,
      SessionCache.dirFingerprint(spark, dir)) {
      toks.groupBy("lang")
        .agg(percentile(col("tok"),
          array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
        .select(col("lang"), col("qs").getItem(0).as("q1"),
          col("qs").getItem(1).as("q2"), col("qs").getItem(2).as("q3"))
    }
    toks.join(broadcast(bounds), Seq("lang"))
      .withColumn("bin",
        when(col("tok") <= col("q1"), 0)
          .when(col("tok") <= col("q2"), 1)
          .when(col("tok") <= col("q3"), 2)
          .otherwise(3))
      .groupBy("lang", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok").cast("long")).as("bin_tokens"),
        min(col("tok").cast("long")).as("min_tok"),
        max(col("tok").cast("long")).as("max_tok"))
      .transform(Present.cardSort(_, col("lang"), col("bin")))
  }

  /** Per-source document cap — the Gopher/RefinedWeb "domain capping" rule:
    * no single source may contribute more than `cap` documents to the mix,
    * and when a source exceeds it the BEST documents win (quality-ranked,
    * not an arbitrary head), so a giant crawl cannot drown the mixture
    * however large it grows. Output is the per-source audit card a curation
    * run records with the decision: kept/dropped doc counts, the token
    * volume the cap discards, and the quality boundary (min quality that
    * survived) — the number to tune `cap` against.
    *
    * Ranks only verdict-kept docs ([[graft.operators.TextAnalysis.filterVerdicts]]
    * — capping runs AFTER per-doc filtering in every real pipeline) by
    * (quality_score desc, doc_id) — fully deterministic; NULL-text docs
    * (kept by the verdict, no quality signal) rank last via quality −1.
    *
    * Scale — the same histogram-boundary discipline as [[balanceStrata]]:
    * a bare `row_number` over `source` would sort the whole corpus in
    * |sources| reducers (a handful of reducers own 100 TB — maximal skew).
    * Instead quality_score is trunc6 (≤ 1e6+2 distinct values), so a
    * (source × quality) histogram with doc/token tallies is vocabulary-
    * sized and locates the cap boundary exactly: buckets strictly above it
    * are kept wholesale, strictly below dropped wholesale (token sums read
    * straight off the histogram — those docs are never ranked at all), and
    * only the single boundary-quality sliver re-joins the corpus for an
    * exact doc_id tie-break rank. The corpus-side work is one map-only
    * verdict scan + one histogram aggregate; the rank window sees ~1/1e6
    * of each source.
    */
  // the quality-ranked verdict-kept corpus view the capping family shares —
  // a probe of the session-cached verdict artifact (TextAnalysis
  // .verdictFrame), so the heavy verdict expressions are evaluated once per
  // (session, corpus version), not once per capping query/scan
  private def keptVerdicts(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.verdictFrame(spark, dir)
      .where(col("keep"))
      .select(col("source"), col("doc_id"),
        coalesce(col("quality_score"), lit(-1.0)).as("q"),
        coalesce(col("n_words"), lit(0)).cast("long").as("nw"))

  /** Session-cached per-(source, quality) histogram with descending-
    * quality cumulative counts — the frame every capping consumer reads.
    * CAP-INDEPENDENT (cap only enters the boundary `where` downstream),
    * so every cap probe and every bench lap shares one build. Previously
    * this was a bare `localCheckpoint(true)` rebuilt on EVERY query
    * build — measured 0.40 s of q_domain_cap's 0.53 s wall at sf0.1 was
    * that eager rebuild (DevPlanTime: build 0.40 / exec 0.10). The
    * histogram derives from the session verdict artifact and is
    * ≤ |sources| × 1e6 rows (trunc6-quantized quality), gated like the
    * other corpus-row-bounded artifacts.
    */
  private def capHist(spark: SparkSession, dir: String, dfp: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    SessionCache.cachedBounded(spark, "cap_hist", dir, dfp,
      Tables.cachedCount(spark, dir, "documents", dfp)) {
      val v = keptVerdicts(spark, dir)
      val hist = v.groupBy("source", "q")
        .agg(count(lit(1)).as("c"), sum("nw").as("snw"))
      val wCum = Window.partitionBy("source").orderBy(desc("q"))
      hist.withColumn("cum", sum("c").over(wCum))
    }
  }

  /** [[capHist]]'s row count, cached per (app, corpus version) — ONE
    * in-memory count over the checkpointed artifact per generation (the
    * Dedup cachedLong discipline, family marker `caphist`), feeding the
    * regime guard on the per-source card broadcasts: SOURCES grow with
    * the corpus (web domains at 100 TB), so boundary/tie frames can't
    * carry unconditional broadcast hints any more than the lm vocabulary
    * could. Boundary/tie rows ≤ sources ≤ histogram rows, making this an
    * upper bound in the safe direction.
    */
  /** Lazy count holder — the SessionCache.Memo latch idiom, NOT
    * `computeIfAbsent(_ => histC.count())`: the count is a full Spark job
    * (a verdict+histogram pipeline when cap_hist is gated off past
    * maxRows), and running it inside computeIfAbsent would hold the map's
    * bin lock for the job's duration, blocking concurrent first-touch
    * callers on the lock instead of the latch. */
  private final class CountMemo(f: () => Long) { lazy val get: Long = f() }
  private val capHistCounts =
    new java.util.concurrent.ConcurrentHashMap[String, CountMemo]()
  private def capHistRows(
      spark: SparkSession, dir: String, dfp: String, histC: => DataFrame): Long = {
    val prefix = s"${spark.sparkContext.applicationId}|$dir|caphist"
    val key = s"$prefix|$dfp"
    if (capHistCounts.keySet.removeIf(k => k.startsWith(s"$prefix|") && k != key))
      Tables.invalidate(dir)
    val holder = new CountMemo(() => histC.count())
    val prior = capHistCounts.putIfAbsent(key, holder)
    (if (prior != null) prior else holder).get
  }

  /** Conservative broadcast bytes per per-source card row (source string
    * + two numbers + hash-relation entry overhead). */
  private val CapCardRowBytes = 64L

  // ≤1 boundary row per source: the quality the cap splits + how many of
  // that quality's docs still fit
  private def capBoundary(histC: DataFrame, cap: Int): DataFrame =
    histC
      .where(col("cum") > cap && col("cum") - col("c") < cap)
      .select(col("source").as("__s"), col("q").as("__q"),
        (lit(cap.toLong) - (col("cum") - col("c"))).as("__take"))

  /** Generic histogram-boundary top-`cap`-per-group selection: keep each
    * group's `cap` BEST rows by (`scoreCol` desc, `keyCol` asc) — the
    * reusable combinator behind [[domainCapKeep]], the score-ranked twin
    * of [[balanceStrata]]'s hash-ranked cap.
    *
    * Contract: `scoreCol` must be NON-NULL and FINITELY QUANTIZED (e.g.
    * trunc6 doubles, integer grades) so the (group × score) histogram is
    * bounded — that bound is what lets the cap boundary come from a
    * histogram instead of a whole-group sort; `keyCol` must be unique
    * within its group (the deterministic tie-break).
    *
    * Scale: one histogram aggregate (checkpointed at histogram size — AQE
    * does not reuse its exchange across the consumer branches), a ≤
    * one-row-per-group CUTOFF broadcast back, and an exact rank over ONLY
    * the rows tying the cutoff score. No window ever partitions a whole
    * group. The cutoff row exists for every group, whether or not the cap
    * bites — "no straddling bucket" must not read as "group under cap"
    * (the bug the keep-set spec caught).
    */
  def capGroups(
      df: DataFrame, groupCol: String, scoreCol: String,
      keyCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(groupCol).orderBy(desc(scoreCol))
    val histC = hist.withColumn("__cum", sum("__c").over(wCum))
      .localCheckpoint(true)
    // the histogram is an eager checkpoint, so the exact row count for
    // the cutoff's regime guard is one in-memory pass (this generic
    // combinator is a build-path API, not a bench query — no count cache)
    capGroupsFrom(df, histC, histC.count(), groupCol, scoreCol, keyCol, cap)
  }

  /** [[capGroups]] with the cumulative histogram (and its row count for
    * the regime guard) supplied by the caller — how [[domainCapKeep]]
    * reuses the session-cached [[capHist]] artifact instead of
    * re-materializing its own checkpoint per call. `histC` must carry
    * (groupCol, scoreCol, __c, __cum). */
  private def capGroupsFrom(
      df: DataFrame, histC: DataFrame, histRows: Long,
      groupCol: String, scoreCol: String, keyCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one CUTOFF row per group, ALWAYS: the lowest score contributing a
    // kept row, plus how many of that score's rows still fit (== the
    // whole bucket when it sits fully inside the cap)
    val cutoff = histC
      .where(col("__cum") - col("__c") < cap)
      .groupBy(col(groupCol).as("__g"))
      .agg(min_by(
        struct(col(scoreCol).as("s"),
          least(lit(cap.toLong) - (col("__cum") - col("__c")), col("__c"))
            .as("take")),
        col(scoreCol)).as("__cut"))
      .select(col("__g"), col("__cut.s").as("__q"),
        col("__cut.take").as("__take"))
    // cutoff is ≤1 row per GROUP, and the group domain can grow with the
    // corpus (sources = web domains) — same regime guard as domainCap's
    // card frames
    val cutoffSide =
      if (Present.fitsBroadcast(df.sparkSession, histRows * CapCardRowBytes))
        broadcast(cutoff)
      else cutoff
    val joined = df.join(cutoffSide, col(groupCol) <=> col("__g"))
    val above = joined.where(col(scoreCol) > col("__q"))
    val wTie = Window.partitionBy(groupCol).orderBy(keyCol)
    val tieKept = joined.where(col(scoreCol) === col("__q"))
      .withColumn("__rk", row_number().over(wTie))
      .where(col("__rk") <= col("__take"))
      .drop("__rk")
    above.unionByName(tieKept).drop("__g", "__q", "__take")
  }

  /** The doc_ids surviving [[domainCap]]'s per-source cap — the GATE the
    * card reports on, exposed so a pipeline can apply capping as a stage
    * (filter → dedup → cap, the RefinedWeb order; see PipelineDemo).
    * [[capGroups]] over the verdict-kept corpus: quality is trunc6 (the
    * quantization the histogram needs), NULL-text docs rank last via
    * quality −1.
    */
  def domainCapKeep(spark: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    val dfp = SessionCache.dirFingerprint(spark, dir)
    val histC = capHist(spark, dir, dfp)
    capGroupsFrom(
      keptVerdicts(spark, dir),
      histC.select(col("source"), col("q"),
        col("c").as("__c"), col("cum").as("__cum")),
      capHistRows(spark, dir, dfp, histC),
      "source", "q", "doc_id", cap)
      .select("doc_id")
  }

  def domainCap(spark: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfp = SessionCache.dirFingerprint(spark, dir)
    val v = keptVerdicts(spark, dir)
    // histogram-sized from here down (≤ |sources| × 1e6 rows)
    val histC = capHist(spark, dir, dfp)
    val boundary = capBoundary(histC, cap)
    // REGIME GUARD (r16 self-audit): boundary/tie are ≤1 row per SOURCE,
    // and sources grow with the corpus — web domains at 100 TB — so the
    // hints are bounded to the broadcast-legal regime exactly like the lm
    // vocabulary; past it the SAME plan degrades to source-keyed shuffle
    // joins and the final card keeps a global sort instead of the
    // single-partition cardSort (whose contract is answer-SIZED output).
    val cardRegime = Present.fitsBroadcast(
      spark, capHistRows(spark, dir, dfp, histC) * CapCardRowBytes)
    def side(df: DataFrame) = if (cardRegime) broadcast(df) else df
    val perSrc = histC.groupBy("source").agg(
      sum("c").as("n_docs"),
      // buckets whose every doc ranks past the cap: dropped wholesale,
      // token volume straight off the histogram
      sum(when(col("cum") - col("c") >= cap, col("snw")).otherwise(0L))
        .as("tok_below"),
      // min quality over buckets contributing at least one kept doc ==
      // the oracle's MIN(q) FILTER (rn <= cap)
      min(when(col("cum") - col("c") < cap, col("q"))).as("q_boundary"))
    val wTie = Window.partitionBy("source").orderBy("doc_id")
    val tie = v.join(side(boundary),
        col("source") <=> col("__s") && col("q") === col("__q"))
      .withColumn("__rk", row_number().over(wTie))
      .where(col("__rk") > col("__take"))
      .groupBy("source").agg(sum("nw").as("tok_tie"))
    val card = perSrc.join(side(tie), Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        least(col("n_docs"), lit(cap.toLong)).as("n_kept"),
        greatest(col("n_docs") - cap, lit(0L)).as("n_dropped"),
        (col("tok_below") + coalesce(col("tok_tie"), lit(0L)))
          .as("tokens_dropped"),
        col("q_boundary"))
    if (cardRegime) Present.cardSort(card, col("source"))
    else card.orderBy("source")
  }

  /** Training shard count for [[shuffleShards]] / [[writeTrainingShards]].
    * 8 keeps the sf-test card readable; production sets executor-count ×
    * files-per-executor (the shard FUNCTION below is nShards-agnostic:
    * first md5 hex digit ÷ (16/n) for any n dividing 16, or the first two
    * digits for up to 256 shards).
    */
  val NShards = 8

  // md5-hex of the row key: the portable shuffle key (same idiom as
  // splitAssign — DuckDB and Spark produce identical hex strings, unlike
  // xxhash64 which only Spark has)
  private def shardHash(idCol: String) = md5(col(idCol).cast("string"))

  // shard = first hex digit of the hash mapped onto 0..NShards-1. floor()
  // on both engines — DuckDB CAST(double AS INT) rounds half-away while
  // Spark's truncates, so a bare cast would disagree on x.5
  private def shardOf(idCol: String) =
    floor((expr(s"instr('0123456789abcdef', " +
      s"substring(md5(cast($idCol as string)), 1, 1))") - 1) /
      lit(16 / NShards)).cast("int")

  /** Mixture re-weighting targets: per-language keep rates the sampler
    * enforces (the knob a pretraining run turns after reading
    * `q_mix_report` — here: halve the dominant `en`, trim `zh`; unlisted
    * languages keep everything). Values are plan-time constants so the
    * sampler is a pure map over the corpus.
    */
  val MixWeights: Map[String, Double] = Map("en" -> 0.5, "zh" -> 0.75)

  // keep-threshold as an 8-hex-digit string: doc kept iff the first 8 hex
  // chars of md5(id) sort below it — string comparison, no engine-specific
  // hex-to-int conversion (DuckDB has no conv(); lexicographic compare of
  // fixed-width lowercase hex IS the numeric compare). w ≥ 1 uses the
  // sentinel "g": every hex char sorts below it, so everything keeps.
  private[graft] def hexThreshold(w: Double): String =
    if (w >= 1.0) "g" else f"${(w * 4294967296.0).toLong}%08x"

  /** Deterministic mixture re-sampler — apply [[MixWeights]] to the corpus
    * and emit the per-(lang, source) audit card: total vs kept docs,
    * realized rate vs target. Membership is the md5-prefix bucket of the
    * doc's own id (the [[splitAssign]] idiom), so the SAME docs are kept
    * on every run, engine, and partitioning, and growing the corpus never
    * flips an existing doc's verdict — re-weighting is reproducible and
    * incremental, which `df.sample` can never give.
    * Scale: one map-side verdict + one hash aggregate; the kept-set
    * materialization is the same `where` clause applied to the full row.
    */
  /** The [[MixWeights]] keep verdict as a Column over (doc_id, lang) —
    * shared by [[mixSample]]'s audit card and any pipeline applying the
    * re-weighting as a filter.
    */
  private[graft] def mixKeep: org.apache.spark.sql.Column = {
    val thr = MixWeights.toSeq.sortBy(_._1).foldLeft(lit("g")) {
      case (acc, (l, w)) =>
        when(col("lang") === l, lit(hexThreshold(w))).otherwise(acc)
    }
    substring(md5(col("doc_id").cast("string")), 1, 8) < thr
  }

  def mixSample(spark: SparkSession, dir: String): DataFrame = {
    val target = MixWeights.toSeq.sortBy(_._1).foldLeft(lit(1.0)) {
      case (acc, (l, w)) =>
        when(col("lang") === l, lit(w)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("kept", mixKeep.cast("int"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_total"),
        sum("kept").as("n_kept"))
      .withColumn("realized_rate",
        round(col("n_kept").cast("double") / col("n_total"), 6))
      .withColumn("target_rate", target)
      .transform(Present.cardSort(_, col("lang"), col("source")))
  }

  /** Shard assignment as a reusable transform — shared verbatim by the
    * card ([[shuffleShards]]), the batch layout writer
    * ([[writeTrainingShards]]), and the streaming shard ingester
    * ([[graft.streaming.Streams.shardIngestSink]]), so batch and streamed
    * docs land in the same `shard=K` directories. Membership is a pure
    * function of the row's own key — stateless, composable with any
    * trigger.
    */
  def assignShards(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shard", shardOf(idCol))

  /** Global deterministic pre-training shuffle — the step between curation
    * and the trainer: every doc gets a shard (hash bucket) and a
    * pseudo-random yet reproducible position (md5 order within the shard),
    * so epoch-0 data order is an artifact of the corpus alone — identical
    * across runs, engines, and cluster layouts, never of `df.sample`/RNG
    * state. Emitted as the shard manifest card: per-shard doc/token/char
    * load, each shard's corpus share (the balance check — md5 uniformity
    * keeps shards within ~1% at real corpus sizes), and the first/last doc
    * in shuffle order (the spot-check handles a resumed trainer logs).
    *
    * Scale: shard assignment and the shuffle key are map-side row-local
    * functions; ONE hash aggregate produces the NShards-row card, and the
    * corpus-share denominator is a window sum over that coalesced card —
    * no checkpoint, re-aggregation, or broadcast below the one corpus
    * aggregate (the q_mix_report shape). The actual data movement lives in
    * [[writeTrainingShards]]; this card is its dry-run accounting.
    * Determinism: integer sums exact; doc_share is one double division;
    * first/last doc via min_by/max_by on the full 32-hex-char hash (md5
    * ties are structurally impossible).
    */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .withColumn("__h", shardHash("doc_id"))
      .withColumn("shard", shardOf("doc_id"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min_by(col("doc_id"), col("__h")).as("first_doc"),
        max_by(col("doc_id"), col("__h")).as("last_doc"))
    // corpus-share denominator as a window sum over the NShards-row card
    // (single-partition window on a bounded frame — the cardSort argument),
    // so no checkpoint, re-aggregation, or broadcast job exists below the
    // one corpus aggregate
    cells
      .coalesce(1) // SinglePartition satisfies the window — no exchange
      .withColumn("tot", sum("n_docs").over(Window.partitionBy()))
      .select(col("shard"), col("n_docs"),
        round(col("n_docs").cast("double") / col("tot"), 6).as("doc_share"),
        col("n_tokens"), col("n_chars"), col("first_doc"), col("last_doc"))
      .transform(Present.cardSort(_, col("shard")))
  }

  /** Materialize the [[shuffleShards]] order as the trainer's on-disk
    * layout: `path/shard=K/` directories, rows inside each shard sorted by
    * the md5 shuffle key — a data loader streams shard files sequentially
    * and reads the epoch in shuffled order with zero seek/sort at load
    * time.
    *
    * Scale: one shuffle, keyed by the shard column, into exactly
    * [[NShards]] reducers; each sorts its shard ONCE at write
    * (sortWithinPartitions — engine sort, spill-safe) and writes ONE file
    * per shard directory — the LSH-index lesson (round 7's 2,003-file
    * layout) applied from the start. Shard membership is a pure key
    * function, so an appended corpus re-shards without moving any
    * existing doc's assignment.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, path: String): Unit =
    assignShards(df.withColumn("__h", shardHash(idCol)), idCol)
      // RANGE repartition, not hash: with NShards distinct values hashed
      // into NShards buckets ~1/3 of the writers would sit idle behind
      // murmur3 collisions while collided tasks sort 2-3 shards serially.
      // Range boundaries are sampled VALUES and equal keys never split
      // across partitions, so one-file-per-shard still holds and each
      // reducer owns ~one shard.
      .repartitionByRange(NShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Sequence packing — assemble fixed-token-budget training sequences
    * from consecutive docs (per lang, ordered by doc_id): each doc joins
    * the pack its first token falls into, `pack_id =
    * floor(exclusive_prefix_tokens / budget)`. Output is one row per pack
    * with its doc count, token load, and id range — the packing manifest a
    * trainer's data loader consumes.
    *
    * Scale: the naive form is a single running sum per lang — 5 languages
    * means 5 reducers own the corpus (the same skew balanceStrata refuses).
    * Here the prefix sum is TWO-PHASE, the textbook distributed scan:
    *   1. shard by contiguous doc_id range; per-(lang, shard) token totals
    *      are one map-side aggregate (shard-count-sized frame);
    *   2. a window over that tiny frame turns totals into per-shard
    *      offsets, joined back (broadcast below the session threshold,
    *      keyed shuffle past it — see the regime note in the body); the
    *      full-width window then partitions by (lang, shard) — every
    *      reducer holds one shard's sliver, and offset + within-shard
    *      prefix = the exact global prefix.
    * Result identical to the naive global window (the oracle runs exactly
    * that), with no reducer ever seeing more than `shardSize` rows.
    */
  def packSequences(
      spark: SparkSession, dir: String,
      budget: Int = 2048, shardSize: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fingerprint FIRST, then def (not val) for the token projection: the
    // documents scan must resolve at each USE site — the offsets build
    // inside the artifact block, the packing pass after the cache probe's
    // supersession check has invalidated any pre-mutation catalog listing
    // (the dedupEmbed probes-first discipline)
    val dfp = SessionCache.dirFingerprint(spark, dir)
    def toks = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        coalesce(size(split(col("text"), " ")), lit(0)).as("tok"),
        floor(col("doc_id") / shardSize).as("shard"))
    // REGIME-ADAPTIVE offsets distribution (Present.fitsBroadcast): the
    // offsets frame has one row per populated (lang, shard) pair — rows
    // grow ∝ docs/shardSize, so an unconditional broadcast hard-fails at
    // the 8 GB limit once the corpus is large enough. The estimate prices
    // shards from the cached doc count times a deliberately HIGH language
    // envelope (full ISO-639 code space; overestimating langs only
    // degrades to the shuffle regime a little early, never broadcasts big):
    val estShardRows =
      (Tables.cachedCount(spark, dir, "documents", dfp) / shardSize + 1) *
        PackLangEnvelope
    val prefixWin = Window.partitionBy("lang").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the per-(lang, shard) offsets frame is a session artifact keyed on
    // (corpus version, shardSize) — budget-independent, like capHist is
    // cap-independent: its build is one of the query's two corpus
    // aggregates and the values are a pure function of the corpus, so
    // every pack probe and bench lap shares one build. Rows ∝
    // docs/shardSize, hence the cachedBounded gate (same envelope
    // argument as estShardRows); past the ceiling the build is returned
    // inline and the regime guard below already picks the keyed join.
    // The artifact CONTENT is regime-independent — only the window's
    // exchange shape differs — so a threshold change mid-session safely
    // reuses it.
    val offsets = SessionCache.cachedBounded(
      spark, s"pack_offsets_s$shardSize", dir, dfp, estShardRows) {
      val offsetsAgg =
        toks.groupBy("lang", "shard").agg(sum("tok").as("shard_tok"))
      if (Present.fitsBroadcast(spark, estShardRows * PackOffsetRowBytes)) {
        // broadcast regime: the frame is about to be driver-materialized
        // wholesale anyway, so running its prefix window over one coalesced
        // partition costs nothing asymptotically beyond the broadcast
        // itself and removes the window's hash exchange (one fewer AQE
        // stage materialization: SinglePartition satisfies the window's
        // ClusteredDistribution). (A driver-side collect + local-relation
        // prefix scan was A/B'd here and LOST: the eager collect pays a
        // full scheduler round-trip at build time every lap, while this
        // branch stays inside the one AQE execution.)
        offsetsAgg.coalesce(1)
          .withColumn("offset", coalesce(sum("shard_tok").over(prefixWin), lit(0L)))
          .select("lang", "shard", "offset")
      } else {
        // shuffle regime: the window keeps its natural per-lang hash
        // exchange (per-lang shard lists are window-sized, not corpus-
        // sized)
        offsetsAgg
          .withColumn("offset", coalesce(sum("shard_tok").over(prefixWin), lit(0L)))
          .select("lang", "shard", "offset")
      }
    }
    val joined =
      if (Present.fitsBroadcast(spark, estShardRows * PackOffsetRowBytes))
        toks.join(broadcast(offsets), Seq("lang", "shard"))
      else
        // the join back is keyed on (lang, shard) — the documents side
        // shuffles once, and the downstream per-(lang, shard) window
        // reuses that exact clustering with no extra exchange
        toks.join(offsets, Seq("lang", "shard"))
    joined
      .withColumn("prefix", col("offset") + coalesce(
        sum("tok").over(Window.partitionBy("lang", "shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("prefix") / budget))
      .groupBy("lang", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tok").as("pack_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "pack_id")
  }
}
