package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val df = graft.operators.Dedup.dedupSimhashPairs(spark, "/root/testdata/sf0.1")
    df.count()
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).take(6000))
    spark.stop()
  }
}
