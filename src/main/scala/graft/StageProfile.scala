package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: per-query JOB and STAGE counts — the deterministic half of
  * the wall-time model (wall ≈ stages × scheduling floor + data work).
  * Wall times on this VM wobble ±50% with co-tenant steal; stage counts
  * don't, so a stage regression (a lost exchange reuse, a broadcast that
  * became a join stage chain) is attributable even from a noisy run.
  * Usage: runMain graft.StageProfile [sfDir] [q_name ...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val only = args.filterNot(_.startsWith("/")).toSet
    val spark = GraftSession.create()
    val jobs = new LongAdder
    val stages = new LongAdder
    val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.increment()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.increment()
        tasks.add(s.stageInfo.numTasks.toLong)
      }
    })
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    // warm-up
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def quiesce(): Unit = { Thread.sleep(300) }
    val rows = qs.map { case (name, fn) =>
      quiesce()
      val (j0, s0, t0) = (jobs.sum, stages.sum, tasks.sum)
      val w0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - w0) / 1e9
      quiesce()
      (name, jobs.sum - j0, stages.sum - s0, tasks.sum - t0, wall)
    }
    println(f"${"query"}%-26s jobs stages tasks   wall")
    rows.sortBy(-_._3).foreach { case (n, j, s, t, w) =>
      println(f"$n%-26s $j%4d $s%6d $t%5d  $w%5.3f")
    }
    println(f"[totals] jobs=${rows.map(_._2).sum} stages=${rows.map(_._3).sum} tasks=${rows.map(_._4).sum} wall=${rows.map(_._5).sum}%.2f")
    spark.stop()
  }
}
