package graft

import org.apache.spark.sql.SparkSession

/** Shared clustered-corpus fixture generator for the ANN dev benches
  * ([[DevAnnScaleBench]], [[DevLshSweep]]) — the AnnIndexSpec d64 recall
  * geometry scaled by `n`: unit vectors on `n/100` unit centers with
  * per-dim noise 0.175 σ (the norm-matched hardness of the 16-d spec
  * fixture), label = generating center. Deterministic from `seed` so two
  * mains pointed at the same dir reuse one corpus — and the corpus
  * version (hence every index family store) stays stable across runs.
  */
object DevAnnFixture {
  val Dim = 64
  val Noise = 0.175
  val Seed = 47

  /** Write `dir`/embeddings.parquet (vec_id, label, embedding) if absent;
    * returns true when this call generated it. Centers scale as n/100
    * (the 20k fixture's 200-center density) so cluster hardness — not
    * cluster POPULATION — is what holds constant across decades.
    */
  def ensure(spark: SparkSession, dir: String, n: Int): Boolean = {
    import spark.implicits._
    val target = new java.io.File(s"$dir/embeddings.parquet")
    if (target.exists()) return false
    val rnd = new scala.util.Random(Seed)
    def unit(v: Array[Double]): Array[Double] = {
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    val nCenters = math.max(2, n / 100)
    val centers = Seq.fill(nCenters)(unit(Array.fill(Dim)(rnd.nextGaussian())))
    // generation is driver-side (seeded scala.util.Random has no
    // distributed twin with the same stream) — bounded by the dev-bench
    // decades this tool serves, not a production path
    (0 until n).map { i =>
      val c = rnd.nextInt(nCenters)
      (i.toLong, s"c$c",
        unit(centers(c).map(_ + Noise * rnd.nextGaussian())).map(_.toFloat).toSeq)
    }.toDF("vec_id", "label", "embedding")
      .coalesce(math.max(4, n / 25000))
      .write.mode("overwrite").parquet(target.toString)
    true
  }
}
