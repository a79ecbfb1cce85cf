package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates (SURVEY.md §6 — exchange
  * reuse across *queries*, which Spark's per-plan ReuseExchange cannot do).
  *
  * Some artifacts are derived once per corpus and probed by many queries:
  * language-ID bigram profiles, the verified near-dup edge set shared by
  * `q_dedup_minhash` and `q_dedup_clusters`. Recomputing them per call
  * multiplies the dominant stage of each query. Entries are keyed by
  * (session UUID, artifact, data dir) and materialized with an eager
  * `localCheckpoint`:
  *   - truncates lineage, so iterative consumers (label propagation) don't
  *     re-trigger the producing job;
  *   - stores blocks on the executors — no driver collect, no local-FS
  *     checkpoint dir needed;
  *   - is session-tied, which the key mirrors, so a new session never sees
  *     another session's blocks.
  * On a long-lived 1000-executor service this is the "profile store": train
  * once, serve many. Size discipline: only frames that are orders of
  * magnitude smaller than the corpus (profiles, edge lists) belong here.
  */
object SessionCache {
  private val cache = new ConcurrentHashMap[(String, String), DataFrame]()

  def cached(spark: SparkSession, artifact: String, dir: String)
      (build: => DataFrame): DataFrame =
    cache.computeIfAbsent(
      // identity of the session object: localCheckpoint blocks live on the
      // session's executors, so a different/new session must never hit
      (s"${spark.sparkContext.applicationId}/${System.identityHashCode(spark)}",
        s"$artifact|$dir"),
      _ => build.localCheckpoint(eager = true))

  /** Tests only: drop everything (e.g. between suites sharing a session). */
  private[graft] def clear(): Unit = cache.clear()
}
