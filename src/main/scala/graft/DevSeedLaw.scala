package graft

import org.apache.spark.sql.functions._

/** Dev probe: seeding-variant recall sweep AT THE LAW GEOMETRY (the
  * 200k/2000-pivot DevAnnFixture corpus) — the r20 follow-up to
  * DevSeedRecall after the ℓ=3 default read 0.5 on DevAnnScaleBench's
  * single-query recall card (r19's ℓ=1 read 0.7 there). Per variant the
  * codebook trains FRESH (ℓ and the seed mode are in the centroid-cache
  * key; the ivf/ivfpq store versions fold the centroid hash, so stores
  * re-key automatically) and two recall readings print: the 5-query
  * batch mean (the spec harness's metric — 0.02 granularity) and the
  * single-query annRecall card (the decade table's continuity metric,
  * 0.1 granularity). Recall is deterministic; train walls indicative.
  *
  * Usage: runMain graft.DevSeedLaw [corpusDir] [variants=hash:1,plusplus:1,...]
  */
object DevSeedLaw {
  def main(args: Array[String]): Unit = {
    import graft.operators.{AnnIndex, Similarity}
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_200k_r20")
    val spark = GraftSession.create()
    spark.conf.set("spark.graft.ann.indexRoot", s"${dir}_index/graft_ann")
    DevAnnFixture.ensure(spark, dir,
      args.find(_.startsWith("n=")).map(_.stripPrefix("n=").toInt).getOrElse(200000))
    val variants = args.find(_.startsWith("variants="))
      .map(_.stripPrefix("variants=").split(",").toSeq.map { v =>
        val Array(m, l) = v.split(":"); (m, l.toInt)
      })
      .getOrElse(Seq(("hash", 1), ("plusplus", 1), ("plusplus", 2),
        ("plusplus", 3), ("plusplus", 4)))

    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exactTop = topIds(Similarity.simBatchTopK(spark, dir))

    variants.foreach { case (mode, l) =>
      spark.conf.set("spark.graft.ann.seed", mode)
      spark.conf.set("spark.graft.ann.seedOversample", l.toString)
      val ver = AnnIndex.corpusVersion(spark, dir)
      val t0 = System.nanoTime()
      val k = AnnIndex.centroids(spark, dir, ver).size
      val tw = (System.nanoTime() - t0) / 1e9
      val approx = topIds(Similarity.simAnnBatch(spark, dir))
      val batchMean = exactTop.map { case (q, ids) =>
        ids.intersect(approx.getOrElse(q, Set.empty)).size / 10.0
      }.sum / exactTop.size
      val card = Similarity.annRecall(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      println(f"[seedlaw] seed=$mode%-9s l=$l k=$k%5d train=$tw%7.2f s  " +
        f"batchMean=$batchMean%.3f  card: ivf=${card("ivf")}%.1f " +
        f"ivfpq=${card("ivfpq")}%.1f pq=${card("pq")}%.1f " +
        f"lsh=${card("lsh")}%.1f int8=${card("int8")}%.1f")
    }
    spark.stop()
  }
}
