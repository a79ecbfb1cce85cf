package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.{SessionCache, Tables}

/** One-off probe: why does `repartition(col)` compact the simhash fp
  * artifact to 1 block but leave the embed/ngram pair artifacts at 32?
  * Prints the executed plan + final partition counts for both builds.
  */
object DevR22CompactWhy {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.create()
    val dfp = SessionCache.dirFingerprint(spark, dir)
    val capE = Dedup.embedEffectiveCap(spark, dir, dfp)
    val b = Dedup.embedPairsBuild(spark, dir, dfp, capE).repartition(col("id_a"))
    val ck = b.localCheckpoint(eager = true)
    println(s"[why] embed compacted partitions = ${ck.rdd.getNumPartitions}")
    println("[why] executed plan of the build:")
    println(b.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
