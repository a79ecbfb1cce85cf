package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.{SessionCache, Tables}

/** r22 verdict-item-5 A/B: the r21 checklist still shows 33-task steady
  * reads for q_dedup_embed (1/33), q_dedup_ngram (1/33), q_dedup_simhash
  * (2/33); r21 asserted (without measuring) that these consumers "do real
  * per-row compute and want the parallel blocks". This tool measures it:
  * per family it builds the SAME artifact twice under dev names — (a) the
  * current partitioning, (b) AQE-compacted via the compactBy trick
  * (repartition(col) with no count) — and interleaves the real steady
  * consumer over both, min/med of N laps plus per-probe task counts.
  * For simhash it also times the heavy downstream consumer
  * (simhashPairsOf banding) over both layouts, since that is the consumer
  * the parallel-blocks claim is actually about.
  *
  * Usage: runMain graft.DevR22Compact [sfDir] [laps=N]
  */
object DevR22Compact {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val laps = args.collectFirst { case s if s.startsWith("laps=") => s.drop(5).toInt }
      .getOrElse(7)
    val spark = GraftSession.create()
    val dfp = SessionCache.dirFingerprint(spark, dir)
    val cap = Dedup.textBucketCap(spark)

    // task counter (listener deltas, deterministic)
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })

    def timed(label: String, probes: Seq[(String, () => Unit)]): Unit = {
      probes.foreach { case (_, p) => p() } // warm
      val times = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      val taskCounts = collection.mutable.Map[String, Int]()
      (1 to laps).foreach { _ =>
        probes.foreach { case (vn, p) =>
          Thread.sleep(50); tasks.set(0)
          val t0 = System.nanoTime()
          p()
          times(vn) = times(vn) :+ (System.nanoTime() - t0) / 1e9
          Thread.sleep(50); taskCounts(vn) = tasks.get()
        }
      }
      probes.foreach { case (vn, _) =>
        val ts = times(vn).sorted
        println(f"[cmp] $label%-8s $vn%-10s min ${ts.head}%6.3f  med ${ts(ts.size / 2)}%6.3f  tasks ${taskCounts(vn)}%3d  " +
          ts.map(t => f"$t%5.3f").mkString("[", " ", "]"))
      }
    }

    // ---- embed family: pair artifact consumed by TakeOrdered only ----
    val capE = Dedup.embedEffectiveCap(spark, dir, dfp)
    def embedArt(name: String, compact: Boolean): DataFrame =
      SessionCache.cached(spark, name, dir, s"$dfp/c$capE") {
        val b = Dedup.embedPairsBuild(spark, dir, dfp, capE)
        // NOTE (measured, DevR22CompactWhy): the build's output is already
        // hashpartitioning(id_a, 32) via the pinned vec_id exchange, so a
        // repartition(id_a) is elided as redundant; the full pair key
        // forces a fresh count-free exchange AQE can size.
        if (compact) b.repartition(col("id_a"), col("id_b")) else b
      }
    val ea = embedArt("cmpEA", compact = false)
    val eb = embedArt("cmpEB", compact = true)
    println(s"[cmp] embed artifact partitions: current=${ea.rdd.getNumPartitions} compact=${eb.rdd.getNumPartitions}")
    def takeTop(df: DataFrame): Unit = {
      df.orderBy(desc("sim"), asc("id_a"), asc("id_b")).limit(20).count(); ()
    }
    timed("embed", Seq(
      "current" -> (() => takeTop(ea)),
      "compact" -> (() => takeTop(eb))))

    // ---- ngram family: pair artifact consumed by TakeOrdered only ----
    def ngramArt(name: String, compact: Boolean): DataFrame =
      SessionCache.cached(spark, name, dir, dfp) {
        val b = Dedup.ngramPairsOf(spark, Tables.spread(Tables.documents(spark, dir)), cap)
        if (compact) b.repartition(col("doc_a"), col("doc_b")) else b
      }
    val na = ngramArt("cmpNA", compact = false)
    val nb = ngramArt("cmpNB", compact = true)
    println(s"[cmp] ngram artifact partitions: current=${na.rdd.getNumPartitions} compact=${nb.rdd.getNumPartitions}")
    def takeTopN(df: DataFrame): Unit = {
      df.orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b")).limit(20).count(); ()
    }
    timed("ngram", Seq(
      "current" -> (() => takeTopN(na)),
      "compact" -> (() => takeTopN(nb))))

    // ---- simhash family: fp artifact feeds BOTH the cheap probe and the
    // banding pair search (the "real per-row compute" consumer) ----
    def fpArt(name: String, compact: Boolean): DataFrame =
      SessionCache.cached(spark, name, dir, dfp) {
        val b = Tables.spread(Tables.documents(spark, dir))
          .select(col("doc_id"), expr("simhash64(text)").as("fp"))
        if (compact) b.repartition(col("doc_id")) else b
      }
    val sa = fpArt("cmpSA", compact = false)
    val sb = fpArt("cmpSB", compact = true)
    println(s"[cmp] simhash artifact partitions: current=${sa.rdd.getNumPartitions} compact=${sb.rdd.getNumPartitions}")
    timed("simhash", Seq(
      "current" -> (() => { sa.count(); () }),
      "compact" -> (() => { sb.count(); () })))
    timed("sh_pairs", Seq(
      "current" -> (() => { Dedup.simhashPairsOf(spark, sa).count(); () }),
      "compact" -> (() => { Dedup.simhashPairsOf(spark, sb).count(); () })))
    spark.stop()
  }
}
