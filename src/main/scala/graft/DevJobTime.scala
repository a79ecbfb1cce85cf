package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: per-job wall durations for one query — pinpoints which AQE
  * job eats the wall when StageProfile shows a low job count but a high
  * total. Usage: runMain graft.DevJobTime [sfDir] q_name
  */
object DevJobTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val name = args.find(_.startsWith("q_")).getOrElse {
      System.err.println("usage: runMain graft.DevJobTime [sfDir] q_name")
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
    snap.foreach { case (id, d) => println(f"[jobtime] job=$id%4d ${d}%6.3f s") }
    println(f"[jobtime] total wall ${wall}%6.3f s over ${snap.size} jobs")
    spark.stop()
  }
}
