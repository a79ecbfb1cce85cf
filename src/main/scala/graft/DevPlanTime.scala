package graft

/** Dev tool: splits one query's wall into plan-construction, physical
  * planning, and execution (3 warm reps) — tells a driver-overhead
  * regression apart from a data-path one when DevJobTime shows the job
  * sum well under the wall. Usage: runMain graft.DevPlanTime q_name
  */
object DevPlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val name = args.find(_.startsWith("q_")).getOrElse {
      System.err.println("usage: runMain graft.DevPlanTime q_name")
      sys.exit(2)
    }
    val spark = GraftSession.create()
    val fn = SparkEntry.queries(name)
    (1 to 2).foreach(_ => fn(spark, sfDir).count())
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[plantime] build ${(t1-t0)/1e9}%.3f physical ${(t2-t1)/1e9}%.3f exec ${(t3-t2)/1e9}%.3f")
    }
    spark.stop()
  }
}
