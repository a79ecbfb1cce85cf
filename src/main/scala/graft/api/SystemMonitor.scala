package graft.api

import java.lang.management.ManagementFactory
import java.util.concurrent.{Executors, TimeUnit}

/** Background system-metrics sampler — the reference's `SystemMonitor`
  * (/root/reference/waddle/_sysmetrics.py:51-99, default 5 s interval,
  * `system/` key prefix). The reference samples via psutil and no-ops
  * without it; the JVM always has JMX, so cpu load, heap, and thread count
  * come from ManagementFactory with no optional dependency.
  *
  * Samples buffer through the owning [[WaddleSession]] exactly like user
  * metrics (same batched append path), under the `system/` prefix the
  * read side splits on (Relational.prefixLike / the dashboard's
  * `key NOT LIKE 'system/%'` — /root/reference/waddle/_dashboard_api.py:212).
  */
final class SystemMonitor(
    sess: WaddleSession, runId: String, intervalMillis: Long = 5000L) {

  private val os = ManagementFactory.getOperatingSystemMXBean
  private val mem = ManagementFactory.getMemoryMXBean
  private val threads = ManagementFactory.getThreadMXBean
  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-sysmetrics"); t.setDaemon(true); t
  }

  private def sample(): Unit = {
    val heap = mem.getHeapMemoryUsage
    sess.log(runId, Map(
      "system/cpu.load_avg" -> math.max(os.getSystemLoadAverage, 0.0),
      "system/mem.heap_used_mb" -> heap.getUsed / 1048576.0,
      "system/mem.heap_max_mb" -> heap.getMax / 1048576.0,
      "system/threads.count" -> threads.getThreadCount.toDouble))
  }

  def start(): SystemMonitor = {
    exec.scheduleAtFixedRate(
      () => try sample() catch { case _: Throwable => () },
      0L, intervalMillis, TimeUnit.MILLISECONDS)
    this
  }

  def stop(): Unit = {
    exec.shutdown()
    exec.awaitTermination(2, TimeUnit.SECONDS)
  }
}
