package graft

import org.apache.spark.sql.functions._

/** Dev probe: radius-≤3 pair completeness of the capped simhash pair
  * search vs the uncapped pigeonhole ground truth at a given SF dir.
  */
object DevSimhashRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fps = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), expr("simhash64(text)").as("fp"))
      .localCheckpoint(true)
    def pairs(cap: Int): Set[(Long, Long)] =
      graft.operators.Dedup.simhashPairsOf(spark, fps, cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    val capped = pairs(graft.operators.Dedup.DefaultTextBucketCap)
    println(s"RESULT uncapped=${uncapped.size} capped=${capped.size} " +
      s"kept=${capped.intersect(uncapped).size} extra=${capped.diff(uncapped).size}")
    spark.stop()
  }
}
