package graft

/** Dev probe: COLD artifact-build cost of the text pair searches on two
  * corpora (the 8×-duplication adversarial re-measure, BASELINE.md).
  * Warm the JVM on a small SF first, then time each query's FIRST call
  * per target dir — the SessionCache build — plus a steady-state repeat.
  */
object DevBuildCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/dup8")
    val queries = Seq("q_dedup_exact", "q_dedup_minhash",
      "q_dedup_simhash_pairs", "q_dedup_ngram")
    // JIT warm on the small corpus
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count())
    for (dir <- dirs; q <- queries) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[buildcost] $q%-24s $dir%-24s cold ${cold}%7.3f s  steady ${warm}%6.3f s")
    }
    spark.stop()
  }
}
