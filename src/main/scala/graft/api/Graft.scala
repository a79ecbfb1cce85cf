package graft.api

import org.apache.spark.sql.SparkSession

/** Module-level wandb-style API — the reference's `waddle.init/log/finish`
  * surface (/root/reference/waddle/_api.py) with its thread-safe global
  * active run (/root/reference/waddle/_state.py:23-34): one process-wide
  * active run, log() without init() is an error, finish() clears.
  *
  * `withRun` is the context-manager analog (`with waddle.init(...)`):
  * completed on normal exit, failed on exception
  * (/root/reference/waddle/_run.py:190-209; asserted by the reference's
  * tests/test_api.py:100-127).
  */
object Graft {

  private val lock = new Object
  private var active: Option[(WaddleSession, String)] = None
  private var hookRegistered = false

  /** The reference's atexit semantics (_run.py:71-83): a process that exits
    * with a run still active gets that run flushed and marked `aborted` by
    * a JVM shutdown hook — the WRITE-side abort that complements the
    * store's read-time staleness inference (WaddleStore.runs). Registered
    * once, on first init(). Best-effort by nature: shutdown hooks race
    * Spark's own shutdown, so a failed flush (context already stopped) is
    * swallowed — the staleness inference still covers that case.
    */
  private def registerAbortHook(): Unit =
    if (!hookRegistered) {
      hookRegistered = true
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => abortActive(), "graft-abort-hook"))
    }

  /** Flush-and-abort the active run, if any — the shutdown hook's body,
    * callable directly from specs to simulate process death.
    */
  private[graft] def abortActive(): Unit = lock.synchronized {
    active.foreach { case (sess, id) =>
      try sess.finishRun(id, "aborted")
      catch { case _: Exception => () } // Spark may already be down
    }
    active = None
  }

  def init(
      spark: SparkSession, root: String,
      project: String = "default", name: String = null,
      config: Map[String, String] = Map.empty,
      detectGit: Boolean = false): String = lock.synchronized {
    require(active.isEmpty, "A run is already active; call finish() first")
    registerAbortHook()
    val sess = new WaddleSession(spark, root, project)
    val repo = if (detectGit) GitInfo.detect() else None
    val id = sess.initRun(Option(name).getOrElse(s"run-${System.nanoTime()}"),
      config, repo)
    active = Some((sess, id))
    id
  }

  private def require_active(): (WaddleSession, String) = lock.synchronized {
    active.getOrElse(throw new IllegalStateException(
      "No active run — call Graft.init(...) first")) // reference: _api.py:73-78
  }

  def log(metrics: Map[String, Double], step: Option[Int] = None): Unit = {
    val (sess, id) = require_active(); sess.log(id, metrics, step)
  }
  def logParam(key: String, value: String): Unit = {
    val (sess, id) = require_active(); sess.logParam(id, key, value)
  }
  def logTag(key: String, value: String): Unit = {
    val (sess, id) = require_active(); sess.logTag(id, key, value)
  }
  def logArtifact(name: String, bytes: Array[Byte]): Unit = {
    val (sess, id) = require_active(); sess.logArtifact(id, name, bytes)
  }

  def finish(status: String = "completed"): Unit = lock.synchronized {
    active.foreach { case (sess, id) => sess.finishRun(id, status) }
    active = None
  }

  /** Context-manager form: body gets the run id; status transitions to
    * completed on success, failed on exception (which is rethrown).
    */
  def withRun[T](
      spark: SparkSession, root: String,
      project: String = "default", name: String = null,
      config: Map[String, String] = Map.empty)(body: String => T): T = {
    val id = init(spark, root, project, name, config)
    try {
      val r = body(id)
      finish("completed")
      r
    } catch {
      case e: Throwable =>
        finish("failed")
        throw e
    }
  }

  /** Test hook mirroring the reference's autouse state reset
    * (tests/test_api.py:27-31).
    */
  private[graft] def resetForTest(): Unit = lock.synchronized { active = None }
}
