package graft

import org.apache.spark.sql.functions._

/** Dev tool (r17): decomposes the two-level LSH build wall — is it the
  * banding compute, or the one-file-per-bucket partitioned write? Writes
  * the SAME banded frame three ways and times each.
  * Usage: runMain graft.DevLshWriteShape [corpusDir]
  */
object DevLshWriteShape {
  def main(args: Array[String]): Unit = {
    import graft.operators.AnnIndex
    val dir = args.headOption.getOrElse("/tmp/graft_ann_twolevel")
    val spark = GraftSession.create()
    val ver = AnnIndex.corpusVersion(spark, dir)
    val geom = AnnIndex.lshGeom(spark, dir, ver)
    val banded = AnnIndex.bandify(
      graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      geom).localCheckpoint(true) // isolate write cost from compute
    println(s"[lshshape] rows=${banded.count()} bandBits=${geom.bandBits}")
    def timed(label: String)(f: String => Unit): Unit = {
      val out = s"/tmp/lshshape_$label"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      val t0 = System.nanoTime()
      f(out)
      val files = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(out),
          Array("parquet"), true).size
      println(f"[lshshape] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($files files)")
    }
    timed("part_band_and_key") { out =>
      banded.repartition(col("band_id"), col("band_key"))
        .write.mode("overwrite").partitionBy("band_id", "band_key").parquet(out)
    }
    timed("part_band_sorted_key") { out =>
      banded.repartition(col("band_id"))
        .sortWithinPartitions("band_key")
        .write.mode("overwrite").partitionBy("band_id").parquet(out)
    }
    timed("flat") { out =>
      banded.coalesce(4).write.mode("overwrite").parquet(out)
    }
    spark.stop()
  }
}
