package graft

import org.apache.spark.sql.functions._

/** Dev tool: the FIRST measured bench of the ANN family in the two-level
  * (≥64-pivot) quantizer regime — r17 verdict #2. No driver testdata SF
  * crosses the [[graft.operators.AnnIndex.TwoLevelMinPivots]] threshold
  * (sf0.1 embeddings = 2k vectors → 45 pivots), so until this main the
  * two-level coarse assignment, the 141-cell geometry, and its index
  * builds ran only inside spec fixtures, never end-to-end with walls.
  *
  * Corpus: the AnnIndexSpec d64 recall fixture's geometry EXACTLY
  * (64-d, unit vectors on n/100 unit centers, noise 0.175 σ/dim,
  * seed 47 — [[DevAnnFixture]]; at the default n=20k that is 142 pivots,
  * two-level dispatch), written once to the target dir; label =
  * generating center, so the label-consuming cards run too. `n=` pushes
  * the bench another decade (r17 verdict #5: 100–200k crosses wider
  * band-bit and bigger pivot-count steps 20k cannot reach). Results are
  * recorded in BASELINE.md ("two-level geometry bench") with the sf0.1
  * walls alongside.
  * Usage: runMain graft.DevAnnScaleBench [outDir] [n=20000]
  */
object DevAnnScaleBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.{AnnIndex, PqIndex}
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_twolevel")
    val n = args.find(_.startsWith("n="))
      .map(_.stripPrefix("n=").toInt).getOrElse(20000)
    val spark = GraftSession.create()
    import spark.implicits._
    // per-corpus index root: cold-build walls stay measurable by clearing
    // both dirs, and the shared warehouse's families stay untouched. A
    // SIBLING of the corpus dir, never inside it — corpusVersion
    // fingerprints the corpus dir recursively, so an index root under it
    // would churn the version on every build (and walk the LSH store's
    // thousands of bucket files per probe), which this main's first run
    // measured as a 64 s/probe meltdown
    spark.conf.set("spark.graft.ann.indexRoot", s"${dir}_index/graft_ann")
    // mode=exact|probes: A/B the coarse-assignment mode (r18 — the
    // recall-collapse diagnosis needed the exact-filed twin at 200k)
    args.find(_.startsWith("mode=")).foreach(a =>
      spark.conf.set("spark.graft.ann.assignMode", a.stripPrefix("mode=")))
    // nprobe=N / pivots=K: the r18 recall/scan overrides
    args.find(_.startsWith("nprobe=")).foreach(a =>
      spark.conf.set("spark.graft.ann.nprobe", a.stripPrefix("nprobe=")))
    args.find(_.startsWith("pivots=")).foreach(a =>
      spark.conf.set("spark.graft.ann.pivots", a.stripPrefix("pivots=")))
    // seed=hash|plusplus: the r19 codebook-seeding A/B
    args.find(_.startsWith("seed=")).foreach(a =>
      spark.conf.set("spark.graft.ann.seed", a.stripPrefix("seed=")))
    DevAnnFixture.ensure(spark, dir, n)
    val ver = AnnIndex.corpusVersion(spark, dir)
    val k = AnnIndex.centroids(spark, dir, ver).size
    println(s"[annscale] corpus n=$n d=${DevAnnFixture.Dim} pivots=$k " +
      s"twoLevel=${k > AnnIndex.TwoLevelMinPivots} " +
      s"nprobe=${AnnIndex.probeCount(spark, k)} assignTag=${AnnIndex.assignTag(spark, dir, ver)}")
    require(k > AnnIndex.TwoLevelMinPivots, "fixture must cross the two-level threshold")

    // cold build cost per index family (codebook training is inside the
    // first ensure; remaining ensures reuse it — order reported as run)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annscale] build $label%-8s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    timed("ivf")(AnnIndex.ensureIvf(spark, dir, ver))
    timed("ivfpq")(AnnIndex.ensureIvfPq(spark, dir, ver))
    timed("int8")(AnnIndex.ensureInt8(spark, dir, ver))
    timed("lsh")(AnnIndex.ensureLsh(spark, dir, ver))

    val names = Seq(
      "q_sim_topk", "q_sim_topk_batch", "q_sim_ann_ivf", "q_sim_ann_batch",
      "q_sim_ann_lsh", "q_sim_ann_int8", "q_sim_ann_int8_batch",
      "q_sim_ann_pq", "q_sim_ann_ivfpq", "q_sim_ann_ivfpq_batch",
      "q_knn_label", "q_ann_recall", "q_index_health", "q_cluster_profile",
      "q_tier_advisor",
      // the embedding-curation family at the same 10× geometry: the
      // hyperplane pair search, the centroid card, and the per-dim stats
      // all cross into wider band-bit / two-level regimes here too
      "q_dedup_embed", "q_embed_outliers", "q_embed_dim_stats",
      "q_vector_norms", "q_quantize_embed", "q_quantize_pq")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm (also builds pools/artifacts once)
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[annscale] probe $name%-22s min ${walls.min}%6.3f s " +
        f"(laps ${walls.map(w => f"$w%.3f").mkString("/")})")
    }
    println("[annscale] recall card:")
    graft.operators.Similarity.annRecall(spark, dir).collect()
      .foreach(r => println(s"[annscale]   ${r.getString(0)} recall@10=${r.getDouble(1)}"))
    spark.stop()
  }
}
