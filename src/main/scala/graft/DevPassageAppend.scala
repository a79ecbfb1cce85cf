package graft

import org.apache.spark.sql.functions._

/** Dev probe: the incremental passage store's decade A/B (r19 verdict
  * #7 done-gate). Copies the 500k decade corpus to a scratch dir,
  * ensures the store COLD (full corpus shingle), appends a drop
  * (`nDrop` fresh docs), and measures the incremental ensure — which
  * must shingle only the drop's files — against a one-shot cold build
  * of the full post-append corpus in a second scratch dir. Asserts the
  * boilerplate/top-passage cards are bit-identical between the grown
  * and one-shot stores, and prints walls + delta layout as evidence.
  *
  * Usage: runMain graft.DevPassageAppend [corpusDir] [nDrop=5000]
  */
object DevPassageAppend {
  def main(args: Array[String]): Unit = {
    import graft.operators.{PassageStore, TextAnalysis}
    import graft.sources.SessionCache
    val src = args.find(_.startsWith("/")).getOrElse("/tmp/graft_dedup500k")
    val nDrop = args.find(_.startsWith("nDrop="))
      .map(_.stripPrefix("nDrop=").toInt).getOrElse(5000)
    val spark = GraftSession.create()
    import spark.implicits._
    val root = s"/tmp/graft_psg_ab/index"
    spark.conf.set("spark.graft.text.indexRoot", root)
    val grown = "/tmp/graft_psg_ab/grown"
    val oneshot = "/tmp/graft_psg_ab/oneshot"
    // fresh scratch every run: walls below are colds, not cache hits
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_psg_ab"), true)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.write.parquet(s"$grown/documents.parquet")
    def drop = spark.range(0, nDrop.toLong, 1, 8).map { i =>
      val rnd = new scala.util.Random(990L * (i + 1))
      val vocab = DevDedupScaleBench.LangVocab("en")
      val n = 60 + rnd.nextInt(200)
      (90000000L + i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        "en", s"s${i % 20}")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[psgappend] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    timed("cold ensure (500k)") {
      PassageStore.rows(spark, grown, SessionCache.dirFingerprint(spark, grown)).count()
    }
    drop.write.mode("append").parquet(s"$grown/documents.parquet")
    val grownRows = timed(s"incremental ensure (+$nDrop)") {
      PassageStore.rows(spark, grown, SessionCache.dirFingerprint(spark, grown)).count()
    }
    // one-shot: same final corpus in one write
    spark.read.parquet(s"$grown/documents.parquet")
      .write.parquet(s"$oneshot/documents.parquet")
    val oneRows = timed("one-shot cold ensure (505k)") {
      PassageStore.rows(spark, oneshot, SessionCache.dirFingerprint(spark, oneshot)).count()
    }
    assert(grownRows == oneRows, s"row counts diverge: $grownRows vs $oneRows")
    // delta layout evidence
    new java.io.File(root).listFiles().filter(_.getName.startsWith("passages_"))
      .foreach { fam =>
        val ds = fam.listFiles().map(_.getName).filter(_.startsWith("delta_")).sorted
        println(s"[psgappend] ${fam.getName}: deltas=${ds.mkString(", ")}")
      }
    def card(dir: String) =
      TextAnalysis.boilerplate(spark, dir).collect().map(_.toSeq).toSeq
    def top(dir: String) =
      TextAnalysis.topPassages(spark, dir).collect().map(_.toSeq).toSeq
    assert(card(grown) == card(oneshot), "boilerplate cards diverge")
    assert(top(grown) == top(oneshot), "top-passage cards diverge")
    println(s"[psgappend] cards bit-identical: grown(incremental) == one-shot cold")
    spark.stop()
  }
}
