package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: per-job wall durations for one or more queries — pinpoints
  * which AQE job eats the wall when StageProfile shows a low job count but
  * a high total, and (via the `gap` column = wall − Σjobs) how much of a
  * query's wall is driver-side build/plan time that no job accounts for
  * (eager checkpoints show up as jobs; pure planning, card collects and
  * AQE re-plan gaps show up here).
  * Usage: runMain graft.DevJobTime [sfDir] q_name [q_name2 ...]
  */
object DevJobTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filter(_.startsWith("q_")).toSeq
    if (names.isEmpty) {
      System.err.println("usage: runMain graft.DevJobTime [sfDir] q_name [q_name2 ...]")
      sys.exit(2)
    }
    val spark = GraftSession.create()
    // both buffers are touched from the async listener-bus thread AND the
    // main thread (clear/iterate) — one lock covers every access
    val lock = new Object
    val starts = mutable.Map[Int, Long]()
    val rows = mutable.ArrayBuffer[(Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized { starts(j.jobId) = j.time; () }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        lock.synchronized {
          val d = (j.time - starts.getOrElse(j.jobId, j.time)) / 1e3
          rows += ((j.jobId, d))
          ()
        }
    })
    val summary = mutable.ArrayBuffer[(String, Double, Int, Double)]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm
      (1 to 2).foreach(_ => fn(spark, sfDir).count())
      Thread.sleep(500)
      lock.synchronized(rows.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = lock.synchronized(rows.toList)
      snap.foreach { case (id, d) => println(f"[jobtime] $name job=$id%4d ${d}%6.3f s") }
      val sumJobs = snap.map(_._2).sum
      println(f"[jobtime] $name wall ${wall}%6.3f s over ${snap.size} jobs " +
        f"(sum ${sumJobs}%6.3f, gap ${wall - sumJobs}%6.3f)")
      summary += ((name, wall, snap.size, sumJobs))
    }
    if (names.size > 1) {
      println("[jobtime] ==== summary (warm 3rd run) ====")
      summary.foreach { case (n, w, nj, sj) =>
        println(f"[jobtime] $n%-24s wall ${w}%6.3f  jobs $nj%2d  sum ${sj}%6.3f  gap ${w - sj}%6.3f")
      }
    }
    spark.stop()
  }
}
