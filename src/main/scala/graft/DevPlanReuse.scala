package graft

/** Dev probe: what the prepared-plan cache saves and costs, isolated to
  * the BUILD phase (query-method body + analysis; no execution, so the
  * comparison is immune to executor-side steal). One JVM, both paths
  * interleaved per query (off-lap then on-lap), min over `reps`:
  *   - off: `spark.graft.planCache=false` → the raw registry body runs
  *   - on:  cache hit → fingerprint listing + conf signature +
  *          `select("*")` wrapper — the steady-state serve cost
  * Usage: runMain graft.DevPlanReuse [sfDir] [reps=5]
  */
object DevPlanReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(5)
    val spark = GraftSession.create()
    // warm: artifacts, codegen, AND the plan cache (one on-path build)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    var offTot = 0.0; var onTot = 0.0; var n = 0
    println(f"${"query"}%-26s ${"off_ms"}%8s ${"on_ms"}%8s ${"save_ms"}%8s")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def lap(flag: String): Double = {
          spark.conf.set("spark.graft.planCache", flag)
          (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            df.queryExecution.analyzed
            (System.nanoTime() - t0) / 1e6
          }.min
        }
        lap("false"); lap("true") // warm both paths
        val off = lap("false")
        val on = lap("true")
        offTot += off; onTot += on; n += 1
        println(f"$name%-26s $off%8.2f $on%8.2f ${off - on}%8.2f")
      } catch { case e: Throwable =>
        System.err.println(s"[planreuse] $name failed: ${e.getClass.getSimpleName}")
      } finally spark.conf.unset("spark.graft.planCache")
    }
    println(f"TOTAL over $n queries: off ${offTot / 1000}%.3f s  on ${onTot / 1000}%.3f s  save ${(offTot - onTot) / 1000}%.3f s/pass")
    spark.stop()
  }
}
