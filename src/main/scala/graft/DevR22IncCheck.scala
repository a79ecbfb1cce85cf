package graft

/** One-off: prove the r22 dedup_incremental restructure (cand/candK
  * checkpoints + max_by argmax) computes the identical verdict frame by
  * diffing against the r21 verify dump at the same SF.
  */
object DevR22IncCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val now = SparkEntry.queries("q_dedup_incremental")(spark, "/root/testdata/sf0.01")
    val old = spark.read.parquet("/tmp/verify_r21_e/q_dedup_incremental")
    val d1 = now.exceptAll(old).count(); val d2 = old.exceptAll(now).count()
    println(s"[inccheck] now_rows=${now.count()} old_rows=${old.count()} now-old=$d1 old-now=$d2")
    spark.stop()
  }
}
