package graft.api

import java.lang.management.ManagementFactory
import java.util.concurrent.{Executors, TimeUnit}

import scala.util.Try

/** Background system-metrics sampler — the reference's `SystemMonitor`
  * (/root/reference/waddle/_sysmetrics.py:51-99, default 5 s interval,
  * `system/` key prefix). The reference samples via psutil and no-ops
  * without it; the JVM always has JMX, so cpu load, heap, and thread count
  * come from ManagementFactory with no optional dependency.
  *
  * GPU series mirror the reference's pynvml branch
  * (/root/reference/waddle/_sysmetrics.py:81-95 — per-device
  * `system/gpu{i}_util_percent`, `system/gpu{i}_memory_used_gb`,
  * `system/gpu{i}_temp_c`): a JVM has no NVML binding, so the probe shells
  * out to `nvidia-smi --query-gpu=...` once at start; when the binary is
  * absent or errors the GPU keys are silently omitted, exactly the
  * reference's capability-probe behavior (`_sysmetrics.py:32-38,41`).
  * `gpuCommand` is injectable so tests can fake the binary.
  *
  * Samples buffer through the owning [[WaddleSession]] exactly like user
  * metrics (same batched append path), under the `system/` prefix the
  * read side splits on (Relational.prefixLike / the dashboard's
  * `key NOT LIKE 'system/%'` — /root/reference/waddle/_dashboard_api.py:212).
  */
final class SystemMonitor(
    sess: WaddleSession, runId: String, intervalMillis: Long = 5000L,
    gpuCommand: Seq[String] = SystemMonitor.DefaultGpuCommand) {

  private val os = ManagementFactory.getOperatingSystemMXBean
  private val mem = ManagementFactory.getMemoryMXBean
  private val threads = ManagementFactory.getThreadMXBean
  // capability probe once at construction, like the reference's
  // pynvml.nvmlInit try/except: a sampler must not pay (or log) a failed
  // process spawn every 5 s on a GPU-less host
  private val hasGpu: Boolean = SystemMonitor.queryGpu(gpuCommand).nonEmpty
  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-sysmetrics"); t.setDaemon(true); t
  }

  private def sample(): Unit = {
    val heap = mem.getHeapMemoryUsage
    val gpu =
      if (!hasGpu) Map.empty[String, Double]
      else SystemMonitor.queryGpu(gpuCommand).zipWithIndex.flatMap {
        case ((util, memGb, tempC), i) => Seq(
          s"system/gpu${i}_util_percent" -> util,
          s"system/gpu${i}_memory_used_gb" -> memGb,
          s"system/gpu${i}_temp_c" -> tempC)
      }.toMap
    sess.log(runId, Map(
      "system/cpu.load_avg" -> math.max(os.getSystemLoadAverage, 0.0),
      "system/mem.heap_used_mb" -> heap.getUsed / 1048576.0,
      "system/mem.heap_max_mb" -> heap.getMax / 1048576.0,
      "system/threads.count" -> threads.getThreadCount.toDouble) ++ gpu)
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

object SystemMonitor {

  /** One CSV row per device: utilization %, memory MiB, temperature C. */
  val DefaultGpuCommand: Seq[String] = Seq(
    "nvidia-smi",
    "--query-gpu=utilization.gpu,memory.used,temperature.gpu",
    "--format=csv,noheader,nounits")

  /** Run the GPU query; one (util_percent, memory_used_gb, temp_c) per
    * device, empty on any failure — missing binary, non-zero exit,
    * unparseable output. Never throws: absence of a GPU is a normal state.
    */
  private[api] def queryGpu(cmd: Seq[String]): Seq[(Double, Double, Double)] =
    Try {
      val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      // wait FIRST, read after exit: reading to EOF before waitFor would
      // block forever on a wedged binary (the classic stuck-driver
      // nvidia-smi failure) and the timeout could never fire. The few
      // CSV lines fit comfortably in the OS pipe buffer, so the child
      // never blocks on a full pipe before exiting.
      if (!proc.waitFor(5, TimeUnit.SECONDS)) {
        proc.destroyForcibly() // no zombie per sample on a hung binary
        Seq.empty
      } else if (proc.exitValue != 0) Seq.empty
      else {
        val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
        out.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq.flatMap { line =>
          line.split(",").map(_.trim) match {
            case Array(u, m, t) =>
              Try((u.toDouble, m.toDouble / 1024.0, t.toDouble)).toOption
            case _ => None
          }
        }
      }
    }.getOrElse(Seq.empty)
}
