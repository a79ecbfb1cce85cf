package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.LongAdder

/** Per-query shuffle-volume audit — the number that decides whether a plan
  * survives a 100× scale-up. Plan-shape pins (PlanSpec) prove the INTENDED
  * topology (broadcasts, pushdown, banding); this measures what the
  * topology actually moves: a query whose shuffle volume tracks its input
  * size re-partitions the corpus and becomes the bottleneck at 100 TB,
  * while one whose shuffle stays card/histogram/band-sized scales with the
  * ANSWER, not the data. Run at two scale factors and diff the growth —
  * SCALING.md records the sf0.01 → sf0.1 table.
  *
  * Protocol: one warm-up lap over the audited queries first, so
  * SessionCache artifacts (verdict frame, LM scores, tfidf, band stores)
  * are built before measurement — the audit reports the steady-state
  * serve-many cost, matching how a long-lived engine runs; artifact
  * construction is a one-time train cost already benched in BASELINE.md.
  *
  * Measurement notes:
  *  - the action is a `noop` write, NOT `count()`: under a count Catalyst
  *    prunes every column the row count doesn't need (it can collapse an
  *    aggregate to its grouping keys and eliminate the final sort), so a
  *    count-audit measures a skeleton of the query;
  *  - `inputMetrics.bytesRead` mixes file-scan bytes with block-manager
  *    reads (SessionCache checkpoint blocks land there) and under-reports
  *    some vectorized parquet scans, so RECORDS are the input measure;
  *    shuffle WRITE metrics are exact;
  *  - the listener bus is async, so each query waits for the task-end
  *    count to quiesce before snapshotting.
  */
object ShuffleAudit {

  /** Families chosen so every scale-critical mechanism is covered:
    * broadcast joins, banded dedup, index-probed ANN, histogram capping,
    * artifact probes, sufficient-stats agg, two-phase windows.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_join_agg", "q_rollup_revenue", "q_metric_trend",
    "q_dedup_exact", "q_dup_inflation", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_incremental", "q_dedup_embed", "q_dedup_simhash_pairs",
    "q_dedup_clusters",
    "q_sim_topk", "q_sim_ann_ivf", "q_sim_ann_lsh",
    "q_sim_ann_batch", "q_sim_ann_int8", "q_sim_ann_int8_batch",
    "q_sim_ann_pq", "q_sim_ann_ivfpq", "q_sim_ann_ivfpq_batch",
    "q_domain_cap", "q_corpus_filter", "q_decontaminate",
    "q_text_tfidf", "q_pack_sequences", "q_heavy_hitters",
    "q_json_extract", "q_embed_outliers", "q_boilerplate",
    "q_profile_events")

  final case class Audit(inputRecords: Long, shuffleBytes: Long, shuffleRecords: Long)

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Run `names` against `sfDir` (after a warm-up lap) and return each
    * query's measured task metrics. Shared by [[main]] and
    * ShuffleAuditSpec, which pins the zero-/card-sized-shuffle invariants.
    */
  def measure(
      spark: SparkSession,
      sfDir: String,
      names: Seq[String]): Map[String, Audit] =
    measureFrames(spark,
      names.map(n => n -> (() => SparkEntry.queries(n)(spark, sfDir))))

  /** As [[measure]] over explicit frame thunks — lets a spec audit a
    * build seam (e.g. an artifact's pair search) that the registry only
    * exposes behind a SessionCache, where the steady-state query
    * rightfully shuffles nothing.
    */
  def measureFrames(
      spark: SparkSession,
      frames: Seq[(String, () => DataFrame)]): Map[String, Audit] = {
    frames.foreach { case (n, f) =>
      try exec(f())
      catch { case e: Throwable =>
        System.err.println(s"[audit] warm-up $n failed: ${e.getMessage}") }
    }
    val inputRecs = new LongAdder
    val shuffle = new LongAdder
    val shuffleRecs = new LongAdder
    val tasks = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          inputRecs.add(m.inputMetrics.recordsRead)
          shuffle.add(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecs.add(m.shuffleWriteMetrics.recordsWritten)
          tasks.increment()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // poll until no task-end lands for 300 ms (3 stable 100 ms probes),
    // bounded at 10 s
    def quiesce(): Unit = {
      var stable = 0
      var last = tasks.sum
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val cur = tasks.sum
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    }
    try {
      frames.flatMap { case (n, f) =>
        quiesce()
        val (i0, s0, r0) = (inputRecs.sum, shuffle.sum, shuffleRecs.sum)
        try {
          exec(f())
          quiesce()
          Some(n -> Audit(
            inputRecs.sum - i0, shuffle.sum - s0, shuffleRecs.sum - r0))
        } catch { case e: Throwable =>
          System.err.println(s"[audit] $n failed: ${e.getMessage}")
          None
        }
      }.toMap
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create()
    // `--conf=key=value` args set session confs before the audit — how the
    // SCALING.md both-ways rows (e.g. profile approxDistinct) are measured
    val (confs, queryArgs) = args.toSeq.partition(_.startsWith("--conf="))
    confs.foreach { c =>
      val kv = c.stripPrefix("--conf=").split("=", 2)
      spark.conf.set(kv(0), kv(1))
    }
    val names = if (queryArgs.nonEmpty) queryArgs else DefaultQueries
    val audits = measure(spark, sfDir, names)
    var totalSh = 0L
    names.foreach { n =>
      audits.get(n) match {
        case Some(a) =>
          totalSh += a.shuffleBytes
          println(s"""{"query":"$n","input_records":${a.inputRecords},"shuffle_bytes":${a.shuffleBytes},"shuffle_records":${a.shuffleRecords}}""")
        case None =>
          println(s"""{"query":"$n","error":"failed"}""")
      }
    }
    println(s"""{"total_shuffle_bytes":$totalSh,"sf_dir":"$sfDir","n_queries":${names.size}}""")
    spark.stop()
  }
}
