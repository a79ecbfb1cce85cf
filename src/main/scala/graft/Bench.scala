package graft
import scala.collection.immutable.ListMap
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    // warm-up lap: amortize one-time JVM/codegen/classloading cost so the
    // timed laps measure steady-state query execution (the reference's
    // DuckDB baseline is likewise measured warm — BASELINE.md)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // three timed laps, keep the min: this VM shows ±50% wobble and
    // occasional multi-second host-steal spikes; min-of-N is the standard
    // steady-state estimator and 3 laps bound the chance a spike lands on
    // the same query every lap.
    // A lap entry is Right(seconds) on success, Left(error) on throw —
    // failures are REPORTED, never recorded as a fast lap time.
    def lap(): ListMap[String, Either[String, Double]] =
      ListMap.from(SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          }
        name -> r
      })
    val laps = Seq(lap(), lap(), lap())
    val names = laps.head.keys.toSeq
    val mins = names.flatMap { k =>
      val ok = laps.flatMap(_(k).toOption)
      if (ok.nonEmpty) Some(k -> ok.min) else None
    }
    val errors = names.flatMap { k =>
      laps.flatMap(_(k).left.toOption).headOption.map(k -> _)
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = mins.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    // headline fields FIRST (metric/value/errors/min-map), per-lap detail
    // LAST: the driver keeps only a ~2 KB tail of stdout, so the compact
    // min-map must not be pushed out by the 3× raw-lap arrays. The raw laps
    // still let a reader separate "one lap spiked" from "regressed".
    val lapsJson = names.map { k =>
      val cells = laps.map(_(k).fold(m => jstr("err"), _.toString))
      s"${jstr(k)}:[${cells.mkString(",")}]"
    }.mkString("{", ",", "}")
    val lapTotals = laps.map(_.values.flatMap(_.toOption).sum).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_errors":${errors.size},"errors":$errJson,"queries":$qs,"sf":"$sfDir","lap_totals":$lapTotals,"laps":$lapsJson}""")
    spark.stop()
  }
}
