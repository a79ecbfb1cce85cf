package graft

/** Dev tool: measures the Layout zero-shuffle fast path for keep-latest /
  * last-per-group against the unmanaged-parquet operators at one SF —
  * the r17 verdict-#5 before/after (numbers recorded in SCALING.md).
  * Writes the sf dir's events into a bucketed layout table once, then
  * times both paths warm (min of 3).
  * Usage: runMain graft.DevLayoutUpsert [sfDir]
  */
object DevLayoutUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val table = "events_layout_devbench"
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    graft.sources.Layout.writeEvents(spark, sfDir, table = table, buckets = buckets)
    println(s"[layout] buckets=$buckets")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      val p = df.queryExecution.executedPlan.toString
      val shuffled = p.contains("Exchange hashpartitioning")
      println(f"[layout] $label%-28s min ${walls.min}%6.3f s " +
        f"(laps ${walls.map(w => f"$w%.3f").mkString("/")}, hashExchange=$shuffled)")
    }
    time("upsert_latest parquet")(graft.operators.Tracking.upsertLatest(spark, sfDir))
    time("upsert_latest layout")(graft.sources.Layout.upsertLatest(spark, table))
    time("last_per_group parquet")(graft.operators.Relational.lastPerGroup(spark, sfDir))
    time("last_per_group layout")(graft.sources.Layout.lastPerGroup(spark, table))
    // the scale evidence wall time can't show at a 100k-row SF (where the
    // layout's days×buckets file count, not the exchange, bounds the
    // scan): bytes the window/aggregate actually shuffles per evaluation
    ShuffleAudit.measureFrames(spark, Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("upsert_parquet", () => graft.operators.Tracking.upsertLatest(spark, sfDir)),
      ("upsert_layout", () => graft.sources.Layout.upsertLatest(spark, table)),
      ("lastgrp_parquet", () => graft.operators.Relational.lastPerGroup(spark, sfDir)),
      ("lastgrp_layout", () => graft.sources.Layout.lastPerGroup(spark, table))))
      .toSeq.sortBy(_._1).foreach { case (n, a) =>
        println(f"[layout] $n%-18s shuffleBytes=${a.shuffleBytes}%9d " +
          f"shuffleRecords=${a.shuffleRecords}%7d inputRecords=${a.inputRecords}%8d")
      }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
