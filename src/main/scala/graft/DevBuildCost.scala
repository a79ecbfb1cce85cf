package graft

/** Dev probe: COLD ivf index-build wall A/B across seeding variants,
  * interleaved in one JVM (window-immune ratios, the DevSeedCost
  * discipline) — the r20 done-gate prices the oversampled seeding
  * against the FULL build ("d16 ≥ 0.85 at ≤1.5× build"): training is
  * one leg of ensureIvf (codebook + corpus assignment + partitioned
  * write), so the train-only ratio overstates the user-visible cost.
  * Each lap salts the corpus version, so the codebook trains fresh AND
  * the store builds into a fresh family dir.
  *
  * Usage: runMain graft.DevBuildCost [corpusDir] [reps=2]
  */
object DevBuildCost {
  def main(args: Array[String]): Unit = {
    import graft.operators.AnnIndex
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_200k_r20")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(2)
    val spark = GraftSession.create()
    spark.conf.set("spark.graft.ann.indexRoot", s"${dir}_index_bc/graft_ann")
    val ver = AnnIndex.corpusVersion(spark, dir)

    def lap(l: Int, salt: Int): Double = {
      spark.conf.set("spark.graft.ann.seedOversample", l.toString)
      val t0 = System.nanoTime()
      AnnIndex.ensureIvf(spark, dir, s"${ver}_bc$salt")
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[buildcost] l=$l lap $salt%2d  ${w}%7.3f s")
      w
    }
    val walls = (1 to reps).flatMap { i =>
      Seq(1 -> lap(1, 2 * i), 3 -> lap(3, 2 * i + 1))
    }
    val m1 = walls.collect { case (1, w) => w }.min
    val m3 = walls.collect { case (3, w) => w }.min
    println(f"[buildcost] l=1 min $m1%7.3f s  l=3 min $m3%7.3f s  " +
      f"ratio=${m3 / m1}%5.2f (gate: <= 1.5)")
    spark.stop()
  }
}
