package graft

/** Dev tool: per-query count of parquet scans per source table, from the
  * executed plan — surfaces double-scan shapes (a corpus-derived card
  * rebuilt inline per probe) that are candidates for the session-artifact
  * discipline (strataBoundary / length_bins_bounds / minmax_bounds).
  * Prints only queries that scan some table more than once; `-all` prints
  * every query. Usage: runMain graft.DevScanCount [sfDir] [-all]
  */
object DevScanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.01")
    val all = args.contains("-all")
    val spark = GraftSession.create()
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // executed (pre-AQE-finalization) formatted plan: scan nodes print
        // one Location line per parquet relation
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val counts = tables.map { t =>
          t -> s"$t\\.parquet".r.findAllIn(p).size
        }.filter(_._2 > 0)
        val multi = counts.filter(_._2 > 1)
        if (all || multi.nonEmpty) {
          val label = if (multi.nonEmpty) "MULTI" else "ok"
          println(s"[scancount] $label $name " +
            counts.map { case (t, c) => s"$t=$c" }.mkString(" "))
        }
      } catch {
        case e: Throwable =>
          println(s"[scancount] ERR $name ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
