package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    for (_ <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.textTfidf(spark, "/root/testdata/sf0.1").count()
      println(f"tfidf lap ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
