package graft

import org.apache.spark.sql.functions._

/** Dev probe: price the per-JOB scheduling floor itself (r18, following
  * [[DevFloorDecomp]] — which showed ~87% of the suite wall in `exec`,
  * at ~2.5 jobs/query; this names what one job COSTS and which conf/shape
  * levers move it, so "attack the floor" vs "document it irreducible" is
  * a measured call, not a guess).
  *
  * Shapes, warm, min/median over `reps` runs each:
  *   - `noop job`:       spark.range(1).count() — one job, one task, no
  *                       shuffle, no file scan: the DAGScheduler+task
  *                       round-trip floor.
  *   - `32-task job`:    spark.range(1<<20, numPartitions=32).count() —
  *                       same, 32 task launches: tasks-per-job cost.
  *   - `1 shuffle AQE`:  fresh groupBy-count frame per rep — the
  *                       materialize-stage + AQE-replan + final-stage
  *                       pattern nearly every suite query pays.
  *   - `1 shuffle noAQE`: same frame built against a no-AQE twin session
  *                       (newSession + conf off) — the replan delta.
  *   - `parquet count`:  fresh count over the sf dir's orders table —
  *                       adds catalog/file-listing+footer cost per call.
  *
  * Usage: runMain graft.DevJobFloor [sfDir] [reps=20]
  */
object DevJobFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(20)
    val spark = GraftSession.create()
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")

    // pace=N ms sleeps between reps (untimed): the first run of this
    // probe measured back-to-back submission ~4× slower than the paced
    // in-suite floor (noop 118 ms vs the decomp's 29 ms 1-job queries) —
    // pacing isolates whether the gap is queue/listener backlog or real
    val pace = args.find(_.startsWith("pace="))
      .map(_.stripPrefix("pace=").toLong).getOrElse(0L)
    def bench(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm: codegen + classloading
      val walls = (1 to reps).map { _ =>
        if (pace > 0) Thread.sleep(pace)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[jobfloor] $name%-22s min ${walls.min}%7.2f ms  " +
        f"p50 ${walls(reps / 2)}%7.2f ms  max ${walls.last}%8.2f ms")
    }

    bench("noop job")(spark.range(1).count())
    bench("32-task job")(
      spark.range(0, 1L << 20, 1, 32).count())
    bench("1-shuffle AQE")(
      spark.range(0, 100000, 1, 8).groupBy(col("id") % 10).count().count())
    bench("1-shuffle noAQE")(
      noAqe.range(0, 100000, 1, 8).groupBy(col("id") % 10).count().count())
    // alias the grouping expression: referencing Spark's auto-generated
    // "(id % 100)" name is brittle against expression-naming changes and
    // would break the probe silently if it shifted (r18 ADVICE)
    bench("2-shuffle AQE")(
      spark.range(0, 100000, 1, 8).groupBy((col("id") % 100).as("g")).count()
        .groupBy(col("g") % 10).count().count())
    bench("parquet count")(
      spark.read.parquet(s"$sfDir/orders.parquet").count())
    // the reused-frame twin: what a memoized DataFrame would measure —
    // NOT a legitimate bench shape (AQE reuses materialized shuffle
    // stages on re-execution = result caching); printed so the line
    // between plan reuse and result reuse stays measured and documented
    val reused = spark.range(0, 100000, 1, 8).groupBy(col("id") % 10).count()
    reused.count()
    bench("reused-frame count")(reused.count())
    // the staleness-key candidate for any cross-call plan/artifact reuse:
    // one metadata listing of the corpus dir (no data IO). If this is
    // ~ms, fingerprint-keyed caches can afford a per-call check; if
    // ~tens of ms it eats the saving for floor-priced queries.
    bench("dirFingerprint")(
      graft.sources.SessionCache.dirFingerprint(spark, sfDir))
    spark.stop()
  }
}
