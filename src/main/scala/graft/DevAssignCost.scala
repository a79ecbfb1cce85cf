package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnIndex

/** Dev probe: per-vector coarse-assignment cost of the three quantizer
  * modes (flat / two-level probes / two-level exact) on a synthetic
  * CLUSTERED corpus — the ingest-cost measurement behind the two-level
  * design (BASELINE.md).
  */
object DevAssignCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val d = 64
    val nCenters = 300
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s)
    }
    val centers = Seq.fill(nCenters)(unit(Array.fill(d)(rnd.nextGaussian())))
    // pivots: jittered copies of centers (k ≈ what √n-kmeans would learn;
    // override with arg 2 to probe large-codebook regimes). Arg 3
    // "uniform" draws pivots uniform on the sphere instead — the honest
    // WORST case for the exact bound-pruned mode, where super-pivot
    // means barely discriminate and bounds prune little.
    val k = args.lift(1).map(_.toInt)
      .getOrElse(math.ceil(math.sqrt(n.toDouble)).toInt)
    val uniformPivots = args.lift(2).contains("uniform")
    val cents =
      if (uniformPivots) (0 until k).map(_ => unit(Array.fill(d)(rnd.nextGaussian())))
      else (0 until k).map(i =>
        unit(centers(i % nCenters).map(_ + 0.05 * rnd.nextGaussian())))
    val vecs = (0 until n).map { i =>
      (i.toLong, centers(i % nCenters).map(_ + 0.1 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "v").repartition(32).localCheckpoint(true)
    val flatCb = cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("pivot_id", "pv")
      .groupBy().agg(array_sort(collect_list(struct(col("pivot_id"), col("pv")))).as("pvs"))
    val hier = AnnIndex.hierCodebookOf(spark, cents)
    // sum(cluster) FORCES the assignment expression: count() would prune
    // the column and measure an empty scan
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("cluster")).head().getLong(0)
    def time(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val check = run(df) // warm + checksum
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[assigncost] $name%-12s n=$n k=$k min=${walls.min}%6.2f s " +
        f"laps=${walls.map(w => f"$w%.2f").mkString("/")} sum=$check")
    }
    time("flat", AnnIndex.assign(vecs, flatCb))
    time("probes4", AnnIndex.assignTwo(vecs, hier, 4))
    time("exact", AnnIndex.assignTwoExact(vecs, hier))
    spark.stop()
  }
}
