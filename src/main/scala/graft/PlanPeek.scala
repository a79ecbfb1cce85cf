package graft

/** Dev tool: print the formatted physical plan (and warm timing) of one
  * registered query at sf0.1. Usage: runMain graft.PlanPeek <q_name>
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_join_agg")
    val spark = GraftSession.create()
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    val df = fn(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    df.count()
    println(f"[$name] warm lap ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(12000))
    spark.stop()
  }
}
