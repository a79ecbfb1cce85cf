package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAggs
import graft.operators.{Sampling, Tracking}
import graft.sources.Tables

class SamplingAggSpec extends SparkSpec {

  test("hashSample is deterministic, partition-independent, ~right-sized") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs, "doc_id", 0.3, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample must not depend on partitioning")
    val frac = a.length.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"~30% expected, got $frac")
  }

  test("balanceStrata caps every language at the smallest one") {
    val balanced = Sampling.sampleDocuments(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val floor = Tables.documents(spark, sf).groupBy("lang").count()
      .agg(min("count")).head().getLong(0)
    assert(balanced.values.forall(_ == floor))
    assert(balanced.keySet == Set("de", "en", "es", "fr", "zh"))
  }

  test("balanceStrata picks exactly the lowest (hash, key) rows per stratum") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val got = Sampling.balanceStrata(docs, "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // reference: the naive whole-stratum window (fine at test scale) —
    // same md5 key function as balanceStrata, different physical plan
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val floor = docs.groupBy("lang").count().agg(min("count")).head().getLong(0)
    val want = docs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= floor)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "histogram-driven selection must equal naive selection")
  }

  test("balanceStrata sliver ≡ whole-window: fat boundary bucket, NULL stratum") {
    // r19 verdict #2 pin: the ranked scan now sees ONLY the boundary
    // bucket's sliver; this fixture makes that sliver nontrivial (30k rows
    // over 4096 buckets ⇒ the boundary bucket holds several rows and
    // __take truncates INSIDE it) and includes a NULL stratum (its own
    // stratum per the null-safe join). Reference is the naive
    // whole-stratum window — the semantics both the old whole-window and
    // the sliver form must equal.
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (1L to 30000L)
      .map(i => (if (i % 6 < 3) "a" else if (i % 6 < 5) "b" else null, i))
      .toDF("lang", "doc_id") // strata sizes 15000 / 10000 / 5000 ⇒ floor 5000
    val got = Sampling.balanceStrata(df, "lang", "doc_id")
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val want = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5000)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(got.length == 15000, s"3 strata × floor 5000, got ${got.length}")
    assert(got.sameElements(want), "sliver selection must equal the naive window")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val docs = Tables.documents(spark, sf)
    val sampled = Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.2), seed = 11)
    val en = sampled.where(col("lang") === "en").count().toDouble /
      docs.where(col("lang") === "en").count()
    val others = sampled.where(col("lang") =!= "en").count()
    assert(en > 0.05 && en < 0.4, s"en ~20% expected, got $en")
    assert(others == docs.where(col("lang") =!= "en").count(),
      "unlisted strata keep all rows")
  }

  test("splitAssign: every doc lands in exactly one split, ratios near 80/10/10") {
    val splits = Sampling.splitAssign(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = splits.values.sum
    assert(total == Tables.documents(spark, sf).count(),
      "splits must partition the corpus")
    // md5 buckets: train 204/256, val 26/256, test 26/256 — allow sampling
    // slack at sf0.001's 500 docs
    assert(splits("train").toDouble / total > 0.70 &&
      splits("train").toDouble / total < 0.90)
    assert(splits("val") > 0 && splits("test") > 0)
    // determinism + growth stability: recomputing on a doc_id-filtered
    // corpus never moves a surviving doc between splits (pure key function)
    val half = Sampling.splitAssign(spark, sf) // same inputs, same result
      .collect().map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(half == splits)
  }

  test("packSequences: two-phase prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val packed = Sampling.packSequences(spark, sf)
    val toks = Tables.documents(spark, sf).select(col("lang"), col("doc_id"),
      coalesce(size(split(col("text"), " ")), lit(0)).as("tok"))
    val naive = toks
      .withColumn("prefix", coalesce(
        sum("tok").over(Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("prefix") / 2048))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty,
      "sharded prefix sum must reproduce the single-reducer packing exactly")
    // pack budget honored: every pack except possibly a lang's last stays
    // under budget + its boundary doc's own tokens (docs straddle at most
    // one boundary, by construction of first-token assignment)
    val rows = packed.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, ps) =>
      val ids = ps.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L, "packing starts at pack 0")
    }
  }

  test("mixSample enforces per-lang keep rates via the md5 verdict") {
    val rows = Sampling.mixSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val perLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      l -> (rs.map(_.getAs[Long]("n_kept")).sum, rs.map(_.getAs[Long]("n_total")).sum)
    }
    for ((lang, (kept, total)) <- perLang) {
      val target = Sampling.MixWeights.getOrElse(lang, 1.0)
      if (target >= 1.0)
        assert(kept == total, s"$lang: unweighted language must keep all docs")
      else {
        val rate = kept.toDouble / total
        assert(math.abs(rate - target) < 0.2,
          s"$lang: realized $rate must track target $target")
      }
    }
    // the verdict is the doc's own md5 bucket — recompute independently
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectKept = docs.count { case (id, lang) =>
      val thr = Sampling.hexThreshold(Sampling.MixWeights.getOrElse(lang, 1.0))
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
        .substring(0, 8) < thr
    }
    assert(rows.map(_.getAs[Long]("n_kept")).sum == expectKept,
      "per-doc verdicts must equal the independent md5 recomputation")
    rows.foreach { r =>
      assert(r.getAs[Double]("realized_rate") >= 0.0 &&
        r.getAs[Double]("realized_rate") <= 1.0)
      assert(r.getAs[Double]("target_rate") ==
        Sampling.MixWeights.getOrElse(r.getAs[String]("lang"), 1.0))
    }
  }

  test("shuffleShards: shards partition the corpus; assignment is a pure key function") {
    val rows = Sampling.shuffleShards(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "shards must partition the corpus")
    assert(rows.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 8).toSet))
    // shares sum to ~1 and no shard hoards the corpus (md5 uniformity)
    val shares = rows.map(_.getAs[Double]("doc_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    assert(shares.max < 0.35, s"uniform-ish expected, got max ${shares.max}")
    // stability: the card is identical on a repartitioned input
    val again = Sampling.shuffleShards(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("writeTrainingShards: one file per shard dir, rows in md5 shuffle order") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Sampling.writeTrainingShards(Tables.documents(spark, sf), "doc_id", out)
      val dirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(dirs.nonEmpty && dirs.length <= 8)
      var seen = 0L
      for (d <- dirs) {
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"${d.getName}: expected ONE file per shard, got ${files.length}")
        // within-shard row order is the md5 shuffle order (file order —
        // single file, so read order is write order)
        val ids = spark.read.parquet(d.toString)
          .select("doc_id").collect().map(_.getLong(0))
        val hashes = ids.map(id => org.apache.commons.codec.digest.DigestUtils
          .md5Hex(id.toString))
        assert(hashes.sameElements(hashes.sorted),
          s"${d.getName}: rows must be sorted by md5(doc_id)")
        seen += ids.length
      }
      assert(seen == Tables.documents(spark, sf).count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("approx_count_distinct lands within the HLL error bound") {
    val rows = Tracking.approxDistinct(spark, sf).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("percentile_approx estimates sit at their claimed rank") {
    // the sketch returns actual data points (nearest-rank), the exact form
    // interpolates — in a sparse tail those values differ by the gap
    // between adjacent points, so assert the RANK of each estimate: the
    // fraction of the group at or below it must bracket the target quantile
    val ev = Tables.events(spark, sf)
    Tracking.quantilesApprox(spark, sf).collect().foreach { r =>
      val grp = ev.where(col("event_type") === r.getString(0))
      val n = grp.count().toDouble
      for ((q, i) <- Seq(0.5 -> 1, 0.9 -> 2, 0.99 -> 3)) {
        val est = r.getDouble(i)
        val atOrBelow = grp.where(col("value") <= est).count() / n
        val below = grp.where(col("value") < est).count() / n
        assert(below <= q + 0.02 && atOrBelow >= q - 0.02,
          s"${r.getString(0)} p$q=$est sits at rank ($below, $atOrBelow]")
      }
    }
  }

  test("vectorNorms: norms positive, min <= avg <= max, all labels present") {
    import graft.operators.Similarity
    val rows = Similarity.vectorNorms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("avg_norm"), r.getAs[Double]("max_norm"))
      assert(mn > 0 && mn <= av && av <= mx, s"$mn <= $av <= $mx violated")
    }
    val labels = Tables.events(spark, sf).sparkSession
      .read.parquet(s"$sf/embeddings.parquet").select("label").distinct().count()
    assert(rows.length == labels)
  }

  test("metricTrend: planted linear series recovered exactly; degenerate series guarded to 0") {
    import spark.implicits._
    val day = 86400L
    val base = 1704067200L
    // user 1 "loss": y = 2 + 3·day — slope_per_day 3, r² 1
    val linear = (0 until 10).map(d =>
      (d.toLong, base + d * day, 1L, "loss", 2.0 + 3.0 * d))
    // user 2 "acc": constant — zero y-variance, slope and r² both 0
    val const = (0 until 5).map(d =>
      (100L + d, base + d * day, 2L, "acc", 5.0))
    // user 3 "lr": single point — zero x-variance
    val single = Seq((200L, base + day, 3L, "lr", 0.1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_trend").toString
    (linear ++ const ++ single).toDF("event_id", "ep", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("ep")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    try {
      val by = Tracking.metricTrend(spark, tmp).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r)
        .toMap
      assert(by.keySet == Set((1L, "loss"), (2L, "acc"), (3L, "lr")))
      assert(by((1L, "loss")).getAs[Double]("slope_per_day") == 3.0)
      assert(by((1L, "loss")).getAs[Double]("r2") == 1.0)
      assert(by((2L, "acc")).getAs[Double]("slope_per_day") == 0.0)
      assert(by((2L, "acc")).getAs[Double]("r2") == 0.0)
      assert(by((3L, "lr")).getAs[Double]("slope_per_day") == 0.0)
      assert(by((3L, "lr")).getAs[Double]("r2") == 0.0)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
    // the real corpus: every series present, r² in [0,1]
    val card = Tracking.metricTrend(spark, sf).collect()
    assert(card.length == Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count())
    card.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    }
  }

  test("metricTrend: Σx² beyond Long.MaxValue must not wrap (dense year-scale series)") {
    import spark.implicits._
    // 2,000 hourly points ~2.5 years past the 2024-01-01 x-origin: each
    // x² ≈ 7e15, so Σx² ≈ 1.4e19 > Long.MaxValue — a LongType sum wraps
    // negative, flipping varxn's sign and poisoning slope/r² silently
    // (the DECIMAL(38,0) route sums it exactly)
    val base = 1704067200L
    val x0 = 80000000L
    val pts = (0 until 2000).map { i =>
      val x = x0 + i * 3600L
      (i.toLong, base + x, 9L, "loss", 2.0 + 3.0 * (x.toDouble / 86400.0))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_trend_ovf").toString
    pts.toDF("event_id", "ep", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_seconds(col("ep")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    try {
      val r = Tracking.metricTrend(spark, tmp).collect()(0)
      val slope = r.getAs[Double]("slope_per_day")
      val r2 = r.getAs[Double]("r2")
      assert(math.abs(slope - 3.0) < 1e-4, s"slope $slope should be ~3/day")
      assert(r2 > 0.999999 && r2 <= 1.0 + 1e-9, s"r² $r2 should be ~1")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("domainCap matches the naive quality-ranked cap, card-exact") {
    import graft.operators.TextAnalysis
    val cap = 7 // small enough that every sf0.001 source gets capped
    val card = Sampling.domainCap(spark, sf, cap).collect()
      .map(r => r.getString(0) -> r).toMap
    // naive reference: collect the kept verdicts, sort, cap per source
    val v = TextAnalysis.filterVerdicts(
        Tables.documents(spark, sf), passthrough = Seq("source"))
      .where(col("keep"))
      .select(col("source"), col("doc_id"),
        coalesce(col("quality_score"), lit(-1.0)).as("q"),
        coalesce(col("n_words"), lit(0)).cast("long").as("nw"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val bySrc = v.groupBy(_._1)
    assert(card.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val ranked = rows.sortBy(r => (-r._3, r._2)) // q desc, doc_id asc
      val (kept, dropped) = ranked.splitAt(cap)
      val c = card(src)
      assert(c.getAs[Long]("n_docs") == rows.length)
      assert(c.getAs[Long]("n_kept") == math.min(cap, rows.length))
      assert(c.getAs[Long]("n_dropped") == math.max(rows.length - cap, 0))
      assert(c.getAs[Long]("tokens_dropped") == dropped.map(_._4).sum,
        s"$src: token surplus must equal the naive dropped-token sum")
      assert(c.getAs[Double]("q_boundary") == kept.map(_._3).min,
        s"$src: boundary must be the worst surviving quality")
      assert(dropped.nonEmpty, s"$src: cap=$cap must actually bite at this sf")
    }
    // the gate the card reports on: domainCapKeep's ids == the naive kept set
    val keepIds = Sampling.domainCapKeep(spark, sf, cap)
      .collect().map(_.getLong(0)).sorted
    val naiveKeep = bySrc.values.flatMap(
      _.sortBy(r => (-r._3, r._2)).take(cap).map(_._2)).toArray.sorted
    assert(keepIds.sameElements(naiveKeep),
      "keep set must be exactly the per-source quality-ranked cap")
  }

  test("domainCap rebuilds its cached histogram after a corpus mutation") {
    // the recurring bug class (bit in r13/r14): a fingerprint-keyed cache
    // that detects a corpus mutation MUST drop the catalog's pinned file
    // listing before recomputing — and the new cap_hist artifact + its
    // cached row count both carry that discipline. Append a brand-new
    // source and assert the card (and the regime-guard count behind it)
    // see the post-mutation corpus.
    val tmp = java.nio.file.Files.createTempDirectory("graft_caphist_mut").toString
    val docs = Tables.documents(spark, sf)
    docs.write.parquet(s"$tmp/documents.parquet")
    try {
      val before = Sampling.domainCap(spark, tmp, 7).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
      assert(!before.contains("mutant.example"))
      // append: same texts under a NEW source, ids shifted clear
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("source", lit("mutant.example"))
        .write.mode("append").parquet(s"$tmp/documents.parquet")
      val after = Sampling.domainCap(spark, tmp, 7).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
      assert(after.contains("mutant.example"),
        s"post-append card must include the new source, got ${after.keySet}")
      // pre-existing sources unchanged — the rebuild read a superset, not
      // a stale or doubled listing
      before.foreach { case (src, n) =>
        assert(after(src) == n, s"$src: $n -> ${after(src)} (stale or doubled)")
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("sampleDocuments rebuilds its cached strata boundary after a corpus mutation") {
    // same bug class as the cap-histogram pin: the balance_boundary card
    // is fingerprint-keyed, so an appended stratum must re-derive the
    // global floor instead of serving the pre-mutation boundary
    val tmp = java.nio.file.Files.createTempDirectory("graft_boundary_mut").toString
    val docs = Tables.documents(spark, sf)
    docs.write.parquet(s"$tmp/documents.parquet")
    try {
      val before = Sampling.sampleDocuments(spark, tmp).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val floorBefore = before.values.min
      assert(floorBefore > 3, s"fixture floor too small to detect the drop: $before")
      // append a tiny NEW stratum: the global floor must drop to its size
      // and every language's balanced count must follow it
      docs.limit(3)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("lang", lit("zz"))
        .write.mode("append").parquet(s"$tmp/documents.parquet")
      val after = Sampling.sampleDocuments(spark, tmp).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after.get("zz").contains(3L),
        s"post-append card must include the new stratum, got ${after.keySet}")
      assert(after.values.forall(_ == 3L),
        s"every stratum must re-balance to the new floor 3, got $after")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("lengthBins and packSequences rebuild their cached cards after a corpus mutation") {
    // the remaining documents-fed cards of the r16 artifact sweep share
    // the probes-first discipline the boundary test pins — cover them on
    // one mutated dir: a brand-new language must surface in both cards
    val tmp = java.nio.file.Files.createTempDirectory("graft_cards_mut").toString
    val docs = Tables.documents(spark, sf)
    docs.write.parquet(s"$tmp/documents.parquet")
    try {
      assert(!Sampling.lengthBins(spark, tmp).collect().exists(_.getString(0) == "zz"))
      assert(!Sampling.packSequences(spark, tmp).collect().exists(_.getString(0) == "zz"))
      docs.limit(5)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("lang", lit("zz"))
        .write.mode("append").parquet(s"$tmp/documents.parquet")
      assert(Sampling.lengthBins(spark, tmp).collect().exists(_.getString(0) == "zz"),
        "post-append length bins must include the new language's quartile card")
      assert(Sampling.packSequences(spark, tmp).collect().exists(_.getString(0) == "zz"),
        "post-append packing manifest must include the new language's packs")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("minmaxScale rebuilds its cached bounds after a corpus mutation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_minmax_mut").toString
    val ev = Tables.events(spark, sf)
    ev.write.parquet(s"$tmp/events.parquet")
    try {
      val before = Tracking.minmaxScale(spark, tmp)
      val maxScaledBefore = before.agg(max("scaled")).head().getDouble(0)
      assert(maxScaledBefore == 1.0)
      // append one event per type with value = 10× the old max: every old
      // max row must stop scaling to 1.0 — a stale bounds card would keep
      // emitting 1.0 for them
      val bumped = ev.groupBy("event_type")
        .agg(max("value").as("value"), max("event_id").as("event_id"),
          max("user_id").as("user_id"), max("ts").as("ts"),
          first("props").as("props"))
        .withColumn("value", col("value") * 10)
        .withColumn("event_id", col("event_id") + lit(1000000L))
        .select(ev.columns.map(c => col(c)): _*)
      bumped.write.mode("append").parquet(s"$tmp/events.parquet")
      val after = Tracking.minmaxScale(spark, tmp).collect()
      val ones = after.filter(r => r.getAs[Double]("scaled") == 1.0)
      assert(ones.nonEmpty && ones.forall(_.getAs[Long]("event_id") >= 1000000L),
        "only the appended 10x rows may scale to 1.0 — stale bounds detected otherwise")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("capGroups == naive top-cap under ties, bucket edges, and small groups") {
    import spark.implicits._
    // group a: tie bucket straddles the cap (three 2.0-scores, cap cuts
    // mid-bucket); group b: cap lands exactly on a bucket edge (the
    // no-straddle case); group c: under the cap entirely
    val rows = Seq(
      ("a", 3.0, 1L), ("a", 2.0, 2L), ("a", 2.0, 3L), ("a", 2.0, 4L), ("a", 1.0, 5L),
      ("b", 9.0, 6L), ("b", 8.0, 7L), ("b", 8.0, 8L), ("b", 7.0, 9L),
      ("c", 5.0, 10L))
    val df = rows.toDF("g", "s", "k")
    for (cap <- 1 to 5) {
      val got = Sampling.capGroups(df, "g", "s", "k", cap)
        .select("g", "s", "k").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted.toSeq
      val want = rows.groupBy(_._1).values.flatMap(
        _.sortBy(r => (-r._2, r._3)).take(cap)).toSeq.sorted
      assert(got == want, s"cap=$cap")
    }
  }

  test("domainCap card agrees with its keep set; a generous cap drops nothing") {
    // cross-consistency: the card's n_kept must equal the gate's actual
    // per-source survivor counts (they share the histogram but diverge
    // in the tie handling — this pins them together)
    val card = Sampling.domainCap(spark, sf, 7).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    val keptBySrc = Sampling.domainCapKeep(spark, sf, 7)
      .join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card == keptBySrc)
    // a cap no source reaches: nothing dropped, zero token surplus,
    // boundary = worst kept quality, and the gate keeps every kept doc
    val generous = Sampling.domainCap(spark, sf, 1000000).collect()
    assert(generous.forall(r => r.getAs[Long]("n_dropped") == 0L &&
      r.getAs[Long]("tokens_dropped") == 0L &&
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs")))
    val allKept = Sampling.domainCapKeep(spark, sf, 1000000).count()
    assert(allKept == generous.map(_.getAs[Long]("n_docs")).sum)
  }

  test("domainCap is partition-independent") {
    val a = Sampling.domainCap(spark, sf, 7).collect().toSeq
    // different shuffle layout must not move the tie-break boundary
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(Sampling.domainCap(spark, sf, 7).collect().toSeq == a)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("typed Welford aggregator matches var_pop/avg under any split") {
    import spark.implicits._
    val values = Tables.events(spark, sf).select("value").as[Double]
    val m = values.select(TypedAggs.moments.toColumn).head()
    val ref = Tables.events(spark, sf)
      .agg(avg("value"), var_pop("value"), count(lit(1))).head()
    assert(m.n == ref.getLong(2))
    assert(math.abs(m.mean - ref.getDouble(0)) < 1e-9)
    assert(math.abs(m.variance - ref.getDouble(1)) / ref.getDouble(1) < 1e-9)
    // partition-count invariance
    val m2 = Tables.events(spark, sf).repartition(13).select("value").as[Double]
      .select(TypedAggs.moments.toColumn).head()
    assert(m2.n == m.n && math.abs(m2.variance - m.variance) < 1e-6)
  }
}
