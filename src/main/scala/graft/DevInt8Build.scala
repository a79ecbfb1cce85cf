package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose the int8 store build wall (r18 verdict #4 — at
  * 200k vectors the build read 158 s, the DEAREST of the four index
  * families, for the cheapest transform: map-only symmetric quantization
  * + one unpartitioned parquet write, while ivf WITH codebook training
  * built in 38 s).
  *
  * Phases, interleaved in ONE JVM (the DevPlanReuse window-immunity
  * discipline — contended-window walls cancel in the A/B):
  *   - `scan only`:        read + cast the embeddings (noop write) — the
  *                         IO floor every variant pays.
  *   - `quantize HOISTED`: the shipping [[graft.operators.AnnIndex
  *                         .int8Quantize]] (scale materialized as a
  *                         column) to a noop sink.
  *   - `quantize INLINED`: the pre-r19 form — the per-element lambda
  *                         references the scale EXPRESSION, so the
  *                         interpreted HOF re-evaluates the array_max
  *                         fold (itself a d-element transform) per
  *                         element: O(d²) boxed work per row. This was
  *                         the wall.
  *   - `full build`:       ensureInt8 into a fresh index root (quantize
  *                         + spread + committed parquet write) — the
  *                         end-to-end wall BASELINE.md records.
  *
  * Usage: runMain graft.DevInt8Build [corpusDir] [reps=3]
  */
object DevInt8Build {
  def main(args: Array[String]): Unit = {
    import graft.operators.AnnIndex
    import graft.sources.Tables
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_ann_twolevel")
    val reps = args.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(3)
    val spark = GraftSession.create()

    def vecs = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    // the pre-r19 inlined form, verbatim — kept HERE (not in AnnIndex) as
    // the measured counterfactual
    def int8QuantizeInlined(vectors: org.apache.spark.sql.DataFrame) = {
      val m = array_max(transform(col("v"), x => abs(x))) / lit(127.0)
      val scale = when(m === 0.0, lit(1.0)).otherwise(m)
      vectors.select(col("vec_id"), scale.as("scale"),
        transform(col("v"), x => round(x / scale).cast("tinyint")).as("qv"))
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def bench(name: String)(f: => Unit): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[int8build] $name%-18s min ${walls.min}%8.3f s " +
        f"(laps ${walls.map(w => f"$w%.3f").mkString("/")})")
    }

    noop(vecs) // warm: codegen, file listing, page cache
    bench("scan only")(noop(vecs))
    // run the hoisted leg on BOTH sides of the inlined leg so a steal
    // burst mid-run cannot masquerade as the A/B delta
    bench("quantize HOISTED")(noop(AnnIndex.int8Quantize(vecs)))
    bench("quantize INLINED")(noop(int8QuantizeInlined(vecs)))
    bench("quantize HOISTED")(noop(AnnIndex.int8Quantize(vecs)))
    bench("full build") {
      val root = java.nio.file.Files
        .createTempDirectory("int8_build_root").toString
      spark.conf.set("spark.graft.ann.indexRoot", s"$root/graft_ann")
      AnnIndex.ensureInt8(spark, dir, AnnIndex.corpusVersion(spark, dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
