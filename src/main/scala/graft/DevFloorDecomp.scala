package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev tool: decompose the SUITE's per-query scheduling floor (r17
  * verdict #1 — overlap_x ~6.5 says ~85% of the sequential bench total is
  * fixed per-query cost, not data work; this names the components).
  *
  * For every registry query (warm), min-of-N over:
  *   - build_ms:    DataFrame construction (query-method body: plan
  *                  assembly, artifact-cache probes, card collects)
  *   - physical_ms: analyze + optimize + physical planning
  *                  (`queryExecution.executedPlan` forced, no jobs)
  *   - exec_ms:     `.count()` on the ALREADY-planned frame — job
  *                  scheduling + task execution + AQE replan
  *   - jobs/stages/tasks per execution (listener deltas)
  *
  * Prints per-query lines plus suite totals, sorted by the chosen
  * component (`sort=build|physical|exec|total`, default total), so the
  * biggest floor component — and which queries pay it — reads directly
  * off the output. Usage:
  *   runMain graft.DevFloorDecomp [sfDir] [reps=3] [sort=total]
  */
object DevFloorDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(3)
    val sortBy = args.find(_.startsWith("sort="))
      .map(_.stripPrefix("sort=")).getOrElse("total")
    val spark = GraftSession.create()
    val jobs = new LongAdder; val stages = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.increment()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.increment()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.increment()
    })
    // warm lap: artifacts built, codegen cached — the bench's steady state
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    final case class Row(name: String, build: Double, physical: Double,
        exec: Double, jobs: Double, stages: Double, tasks: Double) {
      def total: Double = build + physical + exec
    }
    val rows = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      try {
        val samples = (1 to reps).map { _ =>
          val j0 = jobs.sum; val s0 = stages.sum; val k0 = tasks.sum
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          // listener bus is async; tiny settle so the deltas are per-run.
          // (counts can still lag a hair — they are diagnostic, the
          // timings are the measurement)
          Thread.sleep(30)
          ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6,
            (jobs.sum - j0).toDouble, (stages.sum - s0).toDouble,
            (tasks.sum - k0).toDouble)
        }
        Some(Row(name,
          samples.map(_._1).min, samples.map(_._2).min, samples.map(_._3).min,
          samples.map(_._4).min, samples.map(_._5).min, samples.map(_._6).min))
      } catch { case e: Throwable =>
        System.err.println(s"[floor] $name failed: ${e.getClass.getSimpleName}")
        None
      }
    }
    val key: Row => Double = sortBy match {
      case "build" => _.build
      case "physical" => _.physical
      case "exec" => _.exec
      case _ => _.total
    }
    println(f"${"query"}%-26s ${"build"}%8s ${"physical"}%9s ${"exec"}%8s ${"total"}%8s ${"jobs"}%5s ${"stg"}%5s ${"task"}%6s")
    rows.sortBy(key).reverse.foreach { r =>
      println(f"${r.name}%-26s ${r.build}%8.1f ${r.physical}%9.1f ${r.exec}%8.1f ${r.total}%8.1f ${r.jobs}%5.0f ${r.stages}%5.0f ${r.tasks}%6.0f")
    }
    def tot(f: Row => Double) = rows.map(f).sum
    println(f"TOTAL over ${rows.size} queries: build ${tot(_.build) / 1000}%.2f s  physical ${tot(_.physical) / 1000}%.2f s  exec ${tot(_.exec) / 1000}%.2f s  sum ${tot(_.total) / 1000}%.2f s  jobs ${tot(_.jobs)}%.0f stages ${tot(_.stages)}%.0f tasks ${tot(_.tasks)}%.0f")
    spark.stop()
  }
}
