package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A throwing query must be LOUD: an stderr line alone vanishes from the
  * driver's correctness report (the query simply has no row — this hid a
  * broken operator for two rounds). [[run]] records every outcome and emits
  * both a per-query `_FAILED` marker file and a machine-readable
  * `verify_summary.json` with ok/failed/error lists, so a silently-skipped
  * query can never hide again. VerifySpec exercises both paths.
  */
object Verify {

  /** Dump each query's result to `outDir/<name>` parquet; on throw, write
    * `outDir/<name>/_FAILED` with the message instead. Returns
    * (ok names, failed name→message) for the summary. Factored out of
    * [[main]] so tests can drive it with an injected (failing) registry
    * without the session-stop side effect.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      only: Option[Set[String]] = None
  ): (List[String], List[(String, String)]) = {
    new java.io.File(outDir).mkdirs()
    val ok = collection.mutable.ListBuffer.empty[String]
    val failed = collection.mutable.ListBuffer.empty[(String, String)]
    queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          ok += name
          System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } catch { case e: Throwable =>
          failed += name -> String.valueOf(e.getMessage)
          val dir = Paths.get(outDir, name)
          // clear any stale dump from a previous run into the same outDir:
          // a plan-analysis throw happens before write() truncates the dir,
          // and valid old parquet next to _FAILED would read as current
          if (Files.isDirectory(dir)) {
            val walk = Files.walk(dir)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { Files.deleteIfExists(p); () })
            finally walk.close() // Files.walk holds a directory handle
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_FAILED"), String.valueOf(e.getMessage))
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        }
      }
    (ok.toList, failed.toList)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeSummary(outDir: String, ok: List[String], failed: List[(String, String)]): Unit = {
    val summary =
      s"""{"ok": ${ok.sorted.map(q).mkString("[", ",", "]")},""" +
      s""" "failed": ${failed.map(_._1).sorted.map(q).mkString("[", ",", "]")},""" +
      s""" "errors": ${failed.sortBy(_._1).map { case (n, m) => s"${q(n)}: ${q(m)}" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name filter (local iteration only —
    // the driver always passes two)
    val (sfDir, outDir) = (args(0), args(1))
    val only = if (args.length > 2) Some(args(2).split(',').toSet) else None
    val spark = GraftSession.create()
    val (ok, failed) = run(spark, sfDir, outDir, SparkEntry.queries, only)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    writeSummary(outDir, ok, failed)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} FAILED: ${failed.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
