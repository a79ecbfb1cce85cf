package graft
object DevFp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = "/root/testdata/sf0.1"
    (1 to 3).foreach(_ => graft.sources.SessionCache.dirFingerprint(spark, dir))
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => graft.sources.SessionCache.dirFingerprint(spark, dir))
      println(f"[fp] 20 listings in ${(System.nanoTime()-t0)/1e9}%.4f s")
    }
    spark.stop()
  }
}
