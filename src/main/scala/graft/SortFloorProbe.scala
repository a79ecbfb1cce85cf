package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder

/** Dev probe: price the final ORDER BY of an answer-sized result.
  * A global orderBy plans a range exchange whose bounds come from a
  * SEPARATE sampling job — pure scheduling floor when the input is a
  * few hundred aggregate rows. Compares three shapes of the same
  * aggregate: no sort / global orderBy / coalesce(1)+sortWithinPartitions
  * (exchange-free single-partition sort, same total order).
  */
object SortFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val jobs = new LongAdder; val stages = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.increment()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.increment()
    })
    def agg() = Tables.orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    def time(name: String)(f: => Unit): Unit = {
      // warm
      f
      Thread.sleep(200)
      val (j0, s0) = (jobs.sum, stages.sum)
      val t0 = System.nanoTime()
      var i = 0; while (i < 5) { f; i += 1 }
      val w = (System.nanoTime() - t0) / 5e9
      Thread.sleep(200)
      println(f"$name%-28s jobs=${(jobs.sum - j0) / 5.0}%4.1f stages=${(stages.sum - s0) / 5.0}%4.1f wall=$w%6.3f s/run")
    }
    // COUNT rows: EliminateSorts removes an un-observed final sort AND
    // its range exchange under count(), so the "orderBy count" row prices
    // the SAME plan as "no-sort count" (the sampling job never runs).
    // What the coalesce row measures in this mode is Coalesce 1 replacing
    // the aggregate's final single-partition exchange — the bench-lap
    // saving, one fewer AQE stage.
    time("count: no-sort")(agg().count())
    time("count: orderBy(=eliminated)")(
      agg().orderBy("o_orderstatus", "o_orderpriority").count())
    time("count: coalesce1")(
      agg().coalesce(1).sortWithinPartitions("o_orderstatus", "o_orderpriority").count())
    // COLLECT rows: the sort is observed, so these two price the real
    // A/B — range exchange + bounds-sampling job vs local 1-partition
    // sort. This is the materialization-path saving (Verify, consumers).
    time("collect: orderBy")(agg().orderBy("o_orderstatus", "o_orderpriority").collect())
    time("collect: coalesce1")(
      agg().coalesce(1).sortWithinPartitions("o_orderstatus", "o_orderpriority").collect())
    spark.stop()
  }
}
