package graft

import org.apache.spark.sql.functions._
import graft.operators.AnnIndex
import graft.sources.Tables

/** Dev probe: agreement of the two-level coarse quantizer with the flat
  * argmax on a real corpus, per group-probe width.
  */
object DevAssignAgree {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    // share a bench corpus's per-corpus index root (DevAnnScaleBench
    // convention) instead of rebuilding codebooks under the default root
    args.find(_.startsWith("indexRoot=")).foreach(a =>
      spark.conf.set("spark.graft.ann.indexRoot", a.stripPrefix("indexRoot=")))
    val ver = AnnIndex.corpusVersion(spark, dir)
    val k = AnnIndex.centroids(spark, dir, ver).size
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val flat = AnnIndex.assign(vecs, AnnIndex.codebook(spark, dir, ver))
      .select(col("vec_id"), col("cluster").as("c_flat"))
      .localCheckpoint(true)
    val hier = AnnIndex.hierCodebook(spark, dir, ver)
    val n = flat.count()
    for (p <- 1 to 4) {
      val two = AnnIndex.assignTwo(vecs, hier, p)
        .select(col("vec_id"), col("cluster").as("c_two"))
      val mismatch = flat.join(two, Seq("vec_id"))
        .where(col("c_flat") =!= col("c_two")).count()
      println(s"RESULT k=$k probes=$p n=$n mismatch=$mismatch " +
        f"agree=${100.0 * (n - mismatch) / n}%.3f%%")
    }
    spark.stop()
  }
}
