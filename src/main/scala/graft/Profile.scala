package graft

/** Dev profiling harness: time each query warm (2 laps, report both), plus
  * parquet layout info. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSet
    val spark = GraftSession.create()
    import graft.sources.Tables
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      println(f"[layout] $t%-12s partitions=${df.rdd.getNumPartitions}")
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    qs.foreach { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name%-22s cold=${times(0)}%6.2f warm=${times(1)}%6.2f")
    }
    spark.stop()
  }
}
