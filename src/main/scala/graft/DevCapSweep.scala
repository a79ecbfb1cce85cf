package graft

import org.apache.spark.sql.functions._

/** Dev probe: nprobe sweep at the WIDTH-CAP geometry (the r20 2M-vector
  * decade, k pinned at IvfWidthPivotCap=8192) — DevAnnScaleBench's law
  * card read ivf/ivfpq 0.2 there (was 0.7 at the 200k law geometry),
  * and the suspected cause is the √k probe law going stale in the cap
  * regime: past the cap, cells blend c = n/(100·k) natural clusters
  * each while nprobe stays √k, so the neighbor cell's rank degrades
  * with n and the probed prefix misses it. This sweep measures the
  * 5-query batch recall and the single-query card per nprobe (probe-side
  * knob only — no retrain; every card key folds nprobe), plus probe
  * wall and the probed-row count, to fit the cap-regime law.
  *
  * Usage: runMain graft.DevCapSweep [corpusDir] [nprobes=91,182,222,364,512]
  */
object DevCapSweep {
  def main(args: Array[String]): Unit = {
    import graft.operators.{AnnIndex, Similarity}
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_2m")
    val spark = GraftSession.create()
    spark.conf.set("spark.graft.ann.indexRoot", s"${dir}_index/graft_ann")
    val nprobes = args.find(_.startsWith("nprobes="))
      .map(_.stripPrefix("nprobes=").split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(91, 182, 222, 364, 512))
    // mode=exact isolates representation-vs-filing: exact-filed cells +
    // global-only probe ranking (rebuilds the store for that tag once)
    args.find(_.startsWith("mode=")).foreach(a =>
      spark.conf.set("spark.graft.ann.assignMode", a.stripPrefix("mode=")))

    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exactTop = topIds(Similarity.simBatchTopK(spark, dir))
    val ver = AnnIndex.corpusVersion(spark, dir)
    val k = AnnIndex.centroids(spark, dir, ver).size
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    println(s"[capsweep] n=$n k=$k lawNprobe=${AnnIndex.probeCount(k)}")

    nprobes.foreach { np =>
      spark.conf.set("spark.graft.ann.nprobe", np.toString)
      try {
        val t0 = System.nanoTime()
        val approx = topIds(Similarity.simAnnBatch(spark, dir))
        val wall = (System.nanoTime() - t0) / 1e9
        val batchMean = exactTop.map { case (q, ids) =>
          ids.intersect(approx.getOrElse(q, Set.empty)).size / 10.0
        }.sum / exactTop.size
        val card = Similarity.annRecall(spark, dir).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        // probed rows for qid 0 under this nprobe (the scan-cost axis)
        val qv = AnnIndex.queryVectors(spark, dir, Seq(0L), ver)(0L)
        val cents = AnnIndex.centroids(spark, dir, ver)
        val cells = AnnIndex.probedCellsConsistent(spark, dir, ver, qv, cents, np)
        val rows = AnnIndex.ivf(spark, dir, ver)
          .where(col("cluster").isin(cells: _*)).count()
        println(f"[capsweep] nprobe=$np%4d  batchMean=$batchMean%.3f  " +
          f"card ivf=${card("ivf")}%.1f ivfpq=${card("ivfpq")}%.1f  " +
          f"probedRows=$rows%7d (${100.0 * rows / n}%.2f%% of corpus)  " +
          f"batchWall=$wall%6.2f s")
      } finally spark.conf.unset("spark.graft.ann.nprobe")
    }
    spark.stop()
  }
}
