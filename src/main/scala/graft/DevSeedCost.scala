package graft

/** Dev probe: codebook TRAINING cost A/B — k-means‖ D² seeding vs the
  * pre-r19 hash draw — interleaved in one JVM (window-immune, the
  * DevPlanReuse discipline). The r18 verdict's done-gate for the seeding
  * change prices it: "build wall ≤ 1.5× current". Each lap trains a
  * FRESH codebook (the seed mode is part of the centroid-cache key; the
  * version salt below defeats the cache between laps of the same mode).
  *
  * Usage: runMain graft.DevSeedCost [corpusDir] [reps=3] [pivots=K]
  */
object DevSeedCost {
  def main(args: Array[String]): Unit = {
    import graft.operators.AnnIndex
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_twolevel")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(3)
    val spark = GraftSession.create()
    args.find(_.startsWith("pivots=")).foreach(a =>
      spark.conf.set("spark.graft.ann.pivots", a.stripPrefix("pivots=")))
    args.find(_.startsWith("l=")).foreach(a =>
      spark.conf.set("spark.graft.ann.seedOversample", a.stripPrefix("l=")))
    val ver = AnnIndex.corpusVersion(spark, dir)

    def lap(mode: String, salt: Int): Double = {
      spark.conf.set("spark.graft.ann.seed", mode)
      val t0 = System.nanoTime()
      // salt the version so every lap trains fresh instead of hitting the
      // centroid cache; the corpus fingerprint itself is untouched
      val k = AnnIndex.centroids(spark, dir, s"${ver}_seedcost$salt").size
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[seedcost] $mode%-9s lap $salt%2d  ${w}%7.3f s  (k=$k)")
      w
    }
    // interleave the modes so a steal burst lands on both
    val walls = (1 to reps).flatMap { i =>
      Seq("hash" -> lap("hash", 2 * i), "plusplus" -> lap("plusplus", 2 * i + 1))
    }
    walls.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (m, ws) =>
      println(f"[seedcost] $m%-9s min ${ws.map(_._2).min}%7.3f s  " +
        f"ratio-vs-hash computed from mins below")
    }
    val h = walls.collect { case ("hash", w) => w }.min
    val p = walls.collect { case ("plusplus", w) => w }.min
    println(f"[seedcost] plusplus/hash = ${p / h}%5.2f  (gate: <= 1.5)")
    spark.stop()
  }
}
