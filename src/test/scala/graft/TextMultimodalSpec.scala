package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables

class TextMultimodalSpec extends SparkSpec {

  test("textTokens: both counts positive, regex count >= ws count on plain text") {
    val df = TextAnalysis.textTokens(spark, sf)
    assert(df.where(col("n_ws_tokens") <= 0 || col("n_bpe_tokens") <= 0).count() == 0)
    // corpus is space-separated alnum words: the two tokenizations agree
    assert(df.where(col("n_ws_tokens") =!= col("n_bpe_tokens")).count() == 0)
  }

  test("redact scrubs emails, IPs, and digit runs with correct counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith@corp.co.uk today"),
      (2L, "server 10.0.42.7 responded, backup at 192.168.1.1"),
      (3L, "order 1234567 ref 98765432 short 123"),
      (4L, "plain text with no pii at all"),
      // digit run INSIDE the email: counts are progressive, so the email's
      // digits are redacted as part of <EMAIL> and only the bare run after
      // it counts as a longnum — raw-text counting would report 2
      (5L, "mail 123456789@example.com and run 9876543")).toDF("doc_id", "text")
    val out = TextAnalysis.redact(df).collect().map(r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"),
          r.getAs[Int]("n_longnums"))).toMap
    assert(out(1L) == ((2, 0, 0)))
    assert(out(2L) == ((0, 2, 0)))
    assert(out(3L) == ((0, 0, 2))) // "123" is under the 6-digit floor
    assert(out(4L) == ((0, 0, 0)))
    assert(out(5L) == ((1, 0, 1))) // in-email digits don't double-count
    // the sha is over the SCRUBBED text: doc 1's must equal the sha of the
    // placeholder form, and the no-PII doc's must equal its raw sha
    val shas = TextAnalysis.redact(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_sha")).toMap
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(shas(1L) == sha("contact <EMAIL> or <EMAIL> today"))
    assert(shas(4L) == sha("plain text with no pii at all"))
  }

  test("decontaminate flags only train docs that share a 13-gram with the eval slice") {
    val mod = TextAnalysis.EvalSliceMod
    val out = TextAnalysis.decontaminate(spark, sf).collect()
    assert(out.nonEmpty, "tiny-vocabulary corpus must show overlap")
    // never flags an eval doc, and every count is positive
    assert(out.forall(r => r.getAs[Long]("doc_id") % mod != 0))
    assert(out.forall(r => r.getAs[Long]("n_shared_grams") > 0))
    // independent recompute for the top hit: its distinct 13-gram set must
    // intersect the union of eval-doc grams in exactly n_shared_grams hashes
    val top = out.head
    val grams = array_distinct(expr("ngram_hashes(text, 13, 'word')"))
    val evalSet = Tables.documents(spark, sf)
      .where(col("doc_id") % mod === 0)
      .select(explode(grams).as("g")).distinct()
      .collect().map(_.getLong(0)).toSet
    val docGrams = Tables.documents(spark, sf)
      .where(col("doc_id") === top.getAs[Long]("doc_id"))
      .select(explode(grams).as("g"))
      .collect().map(_.getLong(0)).toSet
    assert((docGrams & evalSet).size.toLong == top.getAs[Long]("n_shared_grams"))
  }

  test("textQuality scores within [0,1] and ratios within (0,1]") {
    val df = TextAnalysis.textQuality(spark, sf)
    val bad = df.where(
      col("quality_score") < 0 || col("quality_score") > 1 ||
        col("uniq_ratio") <= 0 || col("uniq_ratio") > 1)
    assert(bad.count() == 0)
  }

  test("textLangId confusion matrix covers every document once") {
    val conf = TextAnalysis.textLangId(spark, sf)
    val totalDocs = Tables.documents(spark, sf).count()
    val classified = conf.agg(sum("n_docs")).head().getLong(0)
    assert(classified == totalDocs)
  }

  test("textFingerprint: equal texts get equal digests, fp_size bounded") {
    val df = TextAnalysis.textFingerprint(spark, sf)
    assert(df.where(col("fp_size") > 32).count() == 0)
    // join fingerprints back to texts: identical text => identical digest
    val joined = Tables.documents(spark, sf).select("doc_id", "text")
      .join(df, "doc_id")
      .groupBy("text").agg(countDistinct("fp_digest").as("n"))
    assert(joined.where(col("n") > 1).count() == 0)
  }

  test("multimodalMeta sha matches JVM sha256 of the same bytes") {
    val row = Multimodal.multimodalMeta(spark, sf).head()
    val text = Tables.documents(spark, sf)
      .where(col("doc_id") === row.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("sha") == want)
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
  }

  test("multimodalDecode is deterministic and schema-complete") {
    val a = Multimodal.multimodalDecode(spark, sf).collect()
    val b = Multimodal.multimodalDecode(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("n_frames") >= 1))
  }

  test("multimodalFrames samples every stride-th frame of each payload") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.multimodalFrames(spark, sf, stride = 8)
    val decoded = Multimodal.multimodalDecode(spark, sf)
      .select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_frames")).toMap
    val perDoc = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("max_idx")).collect()
    assert(perDoc.length == decoded.size, "every payload emits frames")
    perDoc.foreach { r =>
      val expect = (decoded(r.getLong(0)) + 7) / 8 // ceil(frames/stride)
      assert(r.getLong(1) == expect)
      assert(r.getAs[Int]("max_idx") % 8 == 0)
    }
  }

  test("multimodalResize never grows a payload and keeps row identity") {
    import org.apache.spark.sql.functions._
    val rs = Multimodal.multimodalResize(spark, sf)
    assert(rs.where(col("resized_bytes") > col("orig_bytes")).count() == 0)
    assert(rs.count() ==
      graft.sources.Tables.documents(spark, sf).count())
  }

  test("ngramCounts: dense per-lang ranks ordered by count desc, gram-asc ties") {
    val rows = TextAnalysis.ngramCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.length <= 10)
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        "ranks are dense 1..k within each language")
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val (ca, cb) = (a.getAs[Long]("n_occurrences"), b.getAs[Long]("n_occurrences"))
          assert(ca >= cb, "ordered by occurrence count desc")
          if (ca == cb)
            assert(a.getAs[String]("gram") < b.getAs[String]("gram"),
              "count ties break on the gram string")
        case _ =>
      }
      rs.foreach { r =>
        assert(r.getAs[String]("gram").contains(" "), "bigram of two tokens")
        assert(r.getAs[Long]("n_docs") >= 1L)
        assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences"),
          "document frequency cannot exceed occurrences")
      }
    }
  }

  test("corpusFilter verdicts are consistent with the component operators") {
    val filt = TextAnalysis.corpusFilter(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val qual = TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val rep = TextAnalysis.textRepetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_ratio")).toMap
    assert(filt.nonEmpty && filt.keySet == qual.keySet)
    filt.foreach { case (id, r) =>
      // same trunc6 boundaries as the component operators
      assert(r.getAs[Double]("quality_score") == qual(id))
      assert(r.getAs[Double]("dup_ratio") == rep(id))
      val expect = Seq(
        if (r.getAs[Int]("n_words") < 12) Some("too_short") else None,
        if (r.getAs[Double]("quality_score") < 0.45) Some("low_quality") else None,
        if (r.getAs[Double]("dup_ratio") > 0.05) Some("repetitive") else None)
        .flatten.mkString(",")
      assert(r.getAs[String]("reasons") == expect)
      assert(r.getAs[Boolean]("keep") == expect.isEmpty)
    }
  }

  test("lmQuality: RLE plan equals the naive per-occurrence scoring; scores negative") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.lmQuality(spark, sf)
    // naive twin of the oracle, in Spark: per-occurrence explode, no RLE
    val occ = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocab = occ.groupBy("token").agg(count(lit(1)).as("cnt")).localCheckpoint()
    val tot = vocab.agg(sum("cnt").as("tot"))
    val lp = vocab.crossJoin(broadcast(tot))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("tot").cast("double")), 6)
          .cast("decimal(18,6)").as("lp"))
    val naive = occ.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .join(lp, Seq("token"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), sum(col("c") * col("lp")).as("lpsum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("lpsum").cast("double") / col("n_tokens"), 6).as("avg_logp"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "native word_counts RLE must reproduce per-occurrence unigram scoring")
    val rows = got.collect()
    assert(rows.length ==
      Tables.documents(spark, sf).where(col("text").isNotNull).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logp") < 0.0, "log-prob of p<1 is negative")
      assert(r.getAs[Long]("n_tokens") > 0)
    }
  }

  test("sourceDrift: KL non-negative, covers every source, spikes on a skewed source") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.sourceDrift(spark, sf).collect()
    val sources = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select("source").distinct().count()
    assert(rows.length == sources, "one row per source")
    rows.foreach { r =>
      // KL >= 0 up to the 1e-9 per-term rounding over the vocabulary
      assert(r.getAs[Double]("kl_vs_corpus") > -1e-3,
        s"${r.getString(0)}: KL must be non-negative, got ${r.getAs[Double]("kl_vs_corpus")}")
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // a synthetic corpus with one wildly skewed source: its KL dominates
    import spark.implicits._
    val synth = ((0 until 50).map(i =>
        (i.toLong, s"common words shared by every source $i", "balanced")) ++
      (50 until 60).map(i =>
        (i.toLong, "zzyx zzyx zzyx zzyx zzyx zzyx zzyx zzyx", "skewed")))
      .toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift").toString
    synth.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val kl = TextAnalysis.sourceDrift(spark, tmp).collect()
        .map(r => r.getString(0) -> r.getAs[Double]("kl_vs_corpus")).toMap
      assert(kl("skewed") > kl("balanced") + 0.5,
        s"the skewed source must spike: $kl")
      // the distinctive-terms card names the token that caused the spike
      val top = TextAnalysis.topicTerms(spark, tmp).collect()
        .filter(r => r.getString(0) == "skewed" && r.getAs[Int]("rank") == 1)
      assert(top.length == 1 && top.head.getAs[String]("token") == "zzyx",
        "the skewed source's top lift term must be its private token")
      assert(top.head.getAs[Double]("lift") > 1.0)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("piiCard: totals reconcile with the per-doc redact counts; injected PII caught") {
    import org.apache.spark.sql.functions._
    val card = TextAnalysis.piiCard(spark, sf).collect()
    assert(card.nonEmpty)
    assert(card.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    // per-source totals must sum to exactly the per-doc scrub counts
    val perDoc = TextAnalysis.textRedact(spark, sf)
      .agg(sum("n_emails"), sum("n_ips"), sum("n_longnums"))
      .collect()(0)
    assert(card.map(_.getAs[Long]("n_emails")).sum == perDoc.getLong(0))
    assert(card.map(_.getAs[Long]("n_ips")).sum == perDoc.getLong(1))
    assert(card.map(_.getAs[Long]("n_longnums")).sum == perDoc.getLong(2))
    card.foreach { r =>
      assert(r.getAs[Long]("docs_with_pii") <= r.getAs[Long]("n_docs"))
      val f = r.getAs[Double]("frac_docs_with_pii")
      assert(f >= 0.0 && f <= 1.0)
    }
    // synthetic: one source clean, one with a known email+ip doc
    import spark.implicits._
    val synth = Seq(
      (1L, "contact me at alice@example.com or 10.0.0.1 today", "dirty"),
      (2L, "plain words only in this document", "dirty"),
      (3L, "nothing sensitive here at all", "clean"))
      .toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pii").toString
    synth.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val by = TextAnalysis.piiCard(spark, tmp).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(by("dirty").getAs[Long]("docs_with_pii") == 1L)
      assert(by("dirty").getAs[Long]("n_emails") == 1L)
      assert(by("dirty").getAs[Long]("n_ips") == 1L)
      assert(by("dirty").getAs[Double]("frac_docs_with_pii") == 0.5)
      assert(by("clean").getAs[Long]("docs_with_pii") == 0L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("boilerplate: counts reconcile with the corpus; a shared header is caught") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    // occurrence total reconciles with an independent per-doc count:
    // every doc with >= 50 tokens contributes exactly floor(n/50) shingles
    val expected = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(floor(size(split(col("text"), " ")) / 50).as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_shingles")).sum == expected)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val d = r.getAs[Long]("n_dup_shingles")
      assert(d >= 0 && d <= n)
      assert(r.getAs[Long]("n_dup_passages") <= r.getAs[Long]("n_passages"))
      assert(r.getAs[Double]("dup_ratio") ==
        BigDecimal(d.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // synthetic: source A's docs all open with the same 50-token header
    // (cross-doc boilerplate); source B's docs are fully unique
    import spark.implicits._
    val header = (0 until 50).map(j => s"hdr$j").mkString(" ")
    val synth = ((0 until 10).map { i =>
        (i.toLong, header + " " + (0 until 50).map(j => s"u${i}x$j").mkString(" "), "A")
      } ++ (10 until 20).map { i =>
        (i.toLong, (0 until 100).map(j => s"v${i}x$j").mkString(" "), "B")
      } :+ (20L, "short doc under fifty tokens", "B"))
      .toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    synth.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val card = TextAnalysis.boilerplate(spark, tmp).collect()
        .map(r => r.getString(0) -> r).toMap
      // A: 2 shingles per doc, the header one duplicated across all 10
      assert(card("A").getAs[Long]("n_shingles") == 20)
      assert(card("A").getAs[Long]("n_dup_shingles") == 10)
      assert(card("A").getAs[Double]("dup_ratio") == 0.5)
      assert(card("A").getAs[Long]("n_dup_passages") == 1)
      // B: nothing repeats; the <50-token doc contributes no shingles
      assert(card("B").getAs[Long]("n_shingles") == 20)
      assert(card("B").getAs[Long]("n_dup_shingles") == 0)
      assert(card("B").getAs[Double]("dup_ratio") == 0.0)
      // the companion card names the shared header as THE repeated passage
      val top = TextAnalysis.topPassages(spark, tmp).collect()
      assert(top.length == 1, s"only the header repeats: ${top.mkString(";")}")
      assert(top.head.getAs[Long]("n_docs") == 10)
      assert(top.head.getAs[Long]("n_occ") == 10)
      assert(top.head.getAs[String]("preview") ==
        (0 until 8).map(j => s"hdr$j").mkString(" "))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("topicTerms: ranks dense 1..5 per source, lift positive, token lifts consistent") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.topicTerms(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"$src: ranks must be dense from 1")
      assert(rs.length <= 5)
      // ranking is by (lift desc, token asc): re-sorting the card's own
      // columns reproduces the rank order
      val sorted = rs.sortBy(r => (-r.getAs[Double]("lift"), r.getAs[String]("token")))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == rs.map(_.getAs[Int]("rank")).sorted.toSeq)
      rs.foreach { r =>
        assert(r.getAs[Double]("lift") > 0.0)
        assert(r.getAs[Long]("c") > 0L)
      }
    }
    // every source with text is represented
    val sources = Tables.documents(spark, sf)
      .where(col("text").isNotNull).select("source").distinct().count()
    assert(bySource.size == sources)
  }

  test("lmFilter: buckets partition each language with ordered score ranges") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.lmFilter(spark, sf).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    val docCounts = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == docCounts.keySet)
    for ((lang, bs) <- perLang) {
      assert(bs.map(_.getAs[Long]("n_docs")).sum == docCounts(lang),
        s"$lang: buckets must partition the language's docs")
      val byName = bs.map(r => r.getAs[String]("bucket") -> r).toMap
      assert(byName.keySet.subsetOf(Set("head", "middle", "tail")))
      // score ranges are ordered and non-overlapping: tail < middle < head
      for ((lo, hi) <- Seq("tail" -> "middle", "middle" -> "head"))
        for (l <- byName.get(lo); h <- byName.get(hi))
          assert(l.getAs[Double]("max_score") <= h.getAs[Double]("min_score"),
            s"$lang: $lo range must sit below $hi")
      // terciles: no bucket swallows the language (ties aside, ~n/3 each)
      if (docCounts(lang) >= 9)
        assert(bs.map(_.getAs[Long]("n_docs")).max < docCounts(lang),
          s"$lang: a single bucket must not hold every doc")
    }
  }

  test("textCompress: partition-independent, matches a direct Deflater, separates repetition") {
    import org.apache.spark.sql.functions._
    def deflateLen(s: String): Long = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new Array[Byte](1 << 20)
      var n = 0L
      while (!d.finished()) n += d.deflate(out)
      d.end(); n
    }
    val rows = TextAnalysis.textCompress(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.nonEmpty)
    // independent recomputation for a sample of docs
    Tables.documents(spark, sf).where(col("doc_id") < 10 && col("text").isNotNull)
      .select("doc_id", "text").collect().foreach { d =>
      val r = rows(d.getLong(0))
      val raw = d.getString(1).getBytes("UTF-8").length
      assert(r.getAs[Long]("n_bytes") == raw)
      assert(r.getAs[Long]("n_compressed") == deflateLen(d.getString(1)),
        s"doc ${d.getLong(0)}: deflate length must match a direct Deflater")
      val expect = if (raw == 0) 1.0
        else math.floor(r.getAs[Long]("n_compressed").toDouble / raw * 1e6) / 1e6
      assert(r.getAs[Double]("ratio") == expect)
    }
    // a pathological long-range repeat compresses far below real prose
    import spark.implicits._
    val synth = Seq(
      (1L, Array.fill(200)("the quick brown fox jumps").mkString(" ")),
      (2L, (0 until 200).map(i => s"w${i * 2654435761L % 977}").mkString(" ")))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_compress").toString
    synth.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val s = TextAnalysis.textCompress(spark, tmp).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ratio")).toMap
      assert(s(1L) < 0.1, s"repeated text must compress hard, got ${s(1L)}")
      assert(s(2L) > s(1L) * 3, "varied text must compress far less")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("textRepetition matches a direct Scala recomputation per doc") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.textRepetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf)
      .where(col("doc_id") < 20 && col("text").isNotNull)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { d =>
      // -1 limit: Spark's split keeps trailing empty tokens; Java's default drops them
      val toks = d.getAs[String]("text").split(" ", -1)
      val grams = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val r = out(d.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("n_grams") == grams.length)
      assert(r.getAs[Int]("n_distinct") == grams.distinct.length)
      val expect =
        if (grams.isEmpty) 0.0
        else math.floor((1.0 - grams.distinct.length.toDouble / grams.length) * 1e6) / 1e6
      assert(r.getAs[Double]("dup_ratio") == expect)
      assert(r.getAs[Boolean]("flagged") == (expect > 0.1))
    }
  }
}
