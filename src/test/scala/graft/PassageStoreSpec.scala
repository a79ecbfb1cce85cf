package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.operators.{PassageStore, TextAnalysis}
import graft.sources.SessionCache

/** The incremental passage store's contract (r19 verdict #7): cold build
  * ≡ the inline transform; an APPEND adds one delta holding only the new
  * files' docs (O(drop)); any non-append mutation rebuilds from scratch;
  * and the cards derived from an incrementally-grown store are
  * bit-identical to a cold one-shot build of the same corpus.
  */
class PassageStoreSpec extends SparkSpec {

  private def toks(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(i * 7 + seed * 13) % 97}x$seed").mkString(" ")
  private val shared = (0 until 50).map(i => s"boiler$i").mkString(" ")

  private def baseDocs = Seq(
    (1L, s"$shared ${toks(1, 70)}", "sa"),
    (2L, s"$shared ${toks(2, 70)}", "sb"),
    (3L, toks(3, 130), "sb"),
    (4L, "short doc under fifty tokens", "sa"))
  private def dropDocs = Seq(
    (5L, s"$shared ${toks(5, 80)}", "sc"),
    (6L, toks(6, 160), "sa"))

  private def writeDocs(dir: String, docs: Seq[(Long, String, String)],
                        mode: String = "overwrite"): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("bigint"))
      .repartition(2)
      .write.mode(mode).parquet(s"$dir/documents.parquet")
  }

  private def inline(docs: Seq[(Long, String, String)]): Set[(String, String, Long, Long, String)] = {
    import spark.implicits._
    PassageStore.passageRows(
      docs.toDF("doc_id", "text", "source")
        .select("doc_id", "source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
  }

  private def storeRows(dir: String): Set[(String, String, Long, Long, String)] =
    PassageStore.rows(spark, dir, SessionCache.dirFingerprint(spark, dir))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet

  private def deltasOf(root: String, dir: String): Seq[String] = {
    val fams = new java.io.File(root).listFiles()
    if (fams == null) return Nil
    fams.filter(_.getName.startsWith("passages_")).toSeq
      .flatMap(_.listFiles().toSeq)
      .map(_.getName).filter(_.startsWith("delta_")).sorted
  }

  private def withStoreRoot[T](f: String => T): T = {
    val root = Files.createTempDirectory("psg_root").toString
    spark.conf.set("spark.graft.text.indexRoot", root)
    try f(root) finally spark.conf.unset("spark.graft.text.indexRoot")
  }

  test("cold build equals the inline transform; the version marker lands") {
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_cold").toString
      writeDocs(dir, baseDocs)
      assert(storeRows(dir) == inline(baseDocs))
      assert(deltasOf(root, dir).size == 1, "one full delta on cold build")
      val fam = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("passages_")).head
      assert(fam.listFiles().exists(_.getName.startsWith("_fp_")),
        "version marker must land after ensure")
    }
  }

  test("delta names are deterministic (delta_NNN, no nonce) — the rename-race guard's contract") {
    // r21 ADVICE: a nonce-suffixed rename target let two racing ensures
    // BOTH commit a delta covering the same corpus files, double-counting
    // n_occ in the union read. With the fixed name the loser's rename
    // fails and it adopts the winner — which requires the target name to
    // be a pure function of the delta sequence. Pin exactly that.
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_name").toString
      writeDocs(dir, baseDocs)
      storeRows(dir) // cold ensure
      writeDocs(dir, dropDocs, mode = "append")
      storeRows(dir) // append ensure
      assert(deltasOf(root, dir) == Seq("delta_000", "delta_001"),
        s"delta names must be nonce-free and sequential: ${deltasOf(root, dir)}")
    }
  }

  test("a lost delta commit with DIVERGENT winner coverage commits the residual (r22 ADVICE #1)") {
    // The r21 adopt-the-winner fix assumed both racers listed the same
    // corpus. If an append lands between the two listings, the winner's
    // delta covers a DIFFERENT (smaller) file set — blind adoption then
    // writes the version marker over a store missing the uncovered docs,
    // permanently (the marker short-circuits every later coverage check).
    // The loser must diff the winner's covered frame and commit the
    // residue as the next delta.
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_race").toString
      writeDocs(dir, baseDocs)
      storeRows(dir) // cold ensure -> a delta_000 covering ONLY the base files
      val fam = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("passages_")).head
      val stash = Files.createTempDirectory("psg_winner").toFile
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(fam, "delta_000"), stash)
      // wipe the store (this JVM "never ensured") and grow the corpus —
      // the planted winner will now cover a stale, smaller file set
      org.apache.commons.io.FileUtils.deleteDirectory(fam)
      writeDocs(dir, dropDocs, mode = "append")
      // plant the stale winner in the window between OUR staging write
      // and the commit rename (the race this seam exists for)
      PassageStore.testBeforeDeltaCommit = seq =>
        if (seq == 0) org.apache.commons.io.FileUtils.copyDirectory(
          stash, new java.io.File(fam, "delta_000"))
      try {
        val rows = storeRows(dir) // loser path: adopt + residual re-check
        assert(rows == inline(baseDocs ++ dropDocs),
          "the adopted store must still cover the files the winner missed")
        assert(deltasOf(root, dir) == Seq("delta_000", "delta_001"),
          s"residual must land as the next delta: ${deltasOf(root, dir)}")
        assert(fam.listFiles().exists(_.getName.startsWith("_fp_")),
          "marker must land once coverage is complete")
      } finally PassageStore.testBeforeDeltaCommit = _ => ()
    }
  }

  test("cold ensure over an empty documents table yields an EMPTY store, not a throw") {
    // r21 ADVICE: the cold/rebuild path passed a zero-path file list to a
    // schema-less parquet read, which threw AnalysisException from schema
    // inference; the declared-schema read must produce an empty store.
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_empty").toString
      // documents.parquet exists but holds no data files (fresh table dir)
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/documents.parquet"))
      assert(storeRows(dir).isEmpty, "empty corpus must ensure to an empty store")
      val fam = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("passages_")).head
      assert(fam.listFiles().exists(_.getName.startsWith("_fp_")),
        "the version marker must still land on an empty ensure")
    }
  }

  test("append adds ONE delta holding only the new files' docs (O(drop))") {
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_app").toString
      writeDocs(dir, baseDocs)
      assert(storeRows(dir) == inline(baseDocs)) // cold ensure
      writeDocs(dir, dropDocs, mode = "append")
      assert(storeRows(dir) == inline(baseDocs ++ dropDocs),
        "merged store must equal the full-corpus transform")
      val deltas = deltasOf(root, dir)
      assert(deltas.size == 2, s"append must ADD a delta, not rebuild: $deltas")
      // the new delta carries only the drop's docs — the O(drop) pin
      val famDir = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("passages_")).head
      val second = famDir.listFiles().map(_.getName)
        .filter(_.startsWith("delta_")).sorted.last
      val dropIds = spark.read.schema(PassageStore.RowsSchema)
        .parquet(s"$famDir/$second/rows")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(dropIds.nonEmpty && dropIds.subsetOf(dropDocs.map(_._1).toSet),
        s"delta must hold only drop docs, got $dropIds")
    }
  }

  test("a non-append mutation (overwrite) rebuilds from scratch") {
    withStoreRoot { root =>
      val dir = Files.createTempDirectory("psg_mut").toString
      writeDocs(dir, baseDocs)
      storeRows(dir) // cold ensure
      writeDocs(dir, dropDocs, mode = "append")
      storeRows(dir) // incremental ensure → 2 deltas
      val mutated = baseDocs.drop(1) ++ dropDocs // doc 1 deleted
      writeDocs(dir, mutated) // overwrite: covered files vanish
      assert(storeRows(dir) == inline(mutated),
        "rebuild must reflect the post-mutation corpus exactly")
      assert(deltasOf(root, dir).size == 1,
        "a broken append contract must rebuild to a single full delta")
    }
  }

  test("cards from an incrementally-grown store are bit-identical to a cold build") {
    withStoreRoot { _ =>
      val grown = Files.createTempDirectory("psg_grown").toString
      writeDocs(grown, baseDocs)
      storeRows(grown) // cold ensure at base
      writeDocs(grown, dropDocs, mode = "append") // then grow
      val cold = Files.createTempDirectory("psg_oneshot").toString
      writeDocs(cold, baseDocs ++ dropDocs) // same corpus, one shot
      def card(dir: String) = TextAnalysis.boilerplate(spark, dir)
        .collect().map(_.toSeq).toSeq
      def top(dir: String) = TextAnalysis.topPassages(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(card(grown) == card(cold),
        "boilerplate card must not depend on how the store grew")
      assert(top(grown) == top(cold),
        "top-passage card must not depend on how the store grew")
    }
  }
}
