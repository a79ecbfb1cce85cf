package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Dev probe: IVF recall under seeding variants on the spec's recall
  * fixtures — the r19 verdict-#3 measurement ("recover the d16 floor
  * under the default seed"). For each variant (seed mode × oversample ℓ
  * × Lloyd iterations) the fixture corpus is written to a FRESH dir (its
  * own fingerprint ⇒ fresh codebook + stores, no cross-variant cache
  * traffic) and mean recall@10 of `q_sim_ann_batch`'s path vs the exact
  * top-10 is printed for probes- and exact-assignment modes, plus the
  * centroid-training wall. Recall numbers are deterministic
  * (window-immune); walls are indicative only.
  *
  * Usage: runMain graft.DevSeedRecall [d16|d64|both]
  */
object DevSeedRecall {
  def main(args: Array[String]): Unit = {
    import graft.operators.{AnnIndex, Similarity}
    val which = args.headOption.getOrElse("d16")
    val spark = GraftSession.create()
    import spark.implicits._

    def unit(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }

    def fixture(d: Int, n: Long, nCenters: Int, noise: Double): Seq[(Long, Seq[Float])] = {
      val rnd = new scala.util.Random(47)
      val centers = Seq.fill(nCenters)(unit(Array.fill(d)(rnd.nextGaussian())))
      (0L until n).map { i =>
        val c = centers(rnd.nextInt(nCenters))
        (i, unit(c.map(_ + noise * rnd.nextGaussian())).map(_.toFloat).toSeq)
      }
    }

    def run(label: String, rows: Seq[(Long, Seq[Float])],
            mode: String, l: Int, iters: Int): Unit = {
      val dir = Files.createTempDirectory(s"seedrecall_$label").toString
      rows.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      spark.conf.set("spark.graft.ann.seed", mode)
      spark.conf.set("spark.graft.ann.seedOversample", l.toString)
      spark.conf.set("spark.graft.ann.kmeansIters", iters.toString)
      val t0 = System.nanoTime()
      val k = AnnIndex.centroids(spark, dir).size
      val trainW = (System.nanoTime() - t0) / 1e9
      def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.select("qid", "vec_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exactTop = topIds(Similarity.simBatchTopK(spark, dir))
      def recallUnder(am: String): Double = {
        spark.conf.set("spark.graft.ann.assignMode", am)
        try {
          val approx = topIds(Similarity.simAnnBatch(spark, dir))
          exactTop.map { case (q, ids) =>
            ids.intersect(approx.getOrElse(q, Set.empty)).size / 10.0
          }.sum / exactTop.size
        } finally spark.conf.unset("spark.graft.ann.assignMode")
      }
      val p = recallUnder("probes"); val e = recallUnder("exact")
      println(f"[seedrecall] $label%-4s seed=$mode%-9s l=$l iters=$iters k=$k%4d " +
        f"probes=$p%.3f exact=$e%.3f train=${trainW}%6.2f s")
      spark.conf.unset("spark.graft.ann.seed")
      spark.conf.unset("spark.graft.ann.seedOversample")
      spark.conf.unset("spark.graft.ann.kmeansIters")
    }

    val variants = args.find(_.startsWith("variants="))
      .map(_.stripPrefix("variants=").split(",").toSeq.map { v =>
        val Array(m, l, it) = v.split(":"); (m, l.toInt, it.toInt)
      })
      .getOrElse(Seq(
        ("hash", 1, 4), ("plusplus", 1, 4), ("plusplus", 2, 4),
        ("plusplus", 3, 4), ("plusplus", 4, 4)))
    if (which == "d16" || which == "both") {
      val rows = fixture(16, 6000L, 100, 0.35)
      variants.foreach { case (m, l, it) => run("d16", rows, m, l, it) }
    }
    if (which == "d64" || which == "both") {
      val rows = fixture(64, 20000L, 200, 0.175)
      variants.foreach { case (m, l, it) => run("d64", rows, m, l, it) }
    }
    spark.stop()
  }
}
