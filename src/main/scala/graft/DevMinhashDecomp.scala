package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose the minhash pair-search COLD build at the r19
  * 500k decade corpus (measured 215 s end-to-end — 5× superlinear vs the
  * r14 8×-dup envelope extrapolated; name the stage before fixing it).
  * Stages, cumulative (each adds one pipeline step; walls are one-shot
  * colds per stage but share the JVM + page cache — compare WITHIN the
  * run):
  *   - shingle:    ngram_hashes over every doc (count of rows)
  *   - sig+band:   minhash_sig + 16-band explode (count)
  *   - capwindow:  capBuckets row_number window over the banded rows
  *   - pairs:      banded self-join + distinct (count of candidate pairs)
  *   - verify:     the shingle-array join-back + exact Jaccard (full)
  * Usage: runMain graft.DevMinhashDecomp [corpusDir]
  */
object DevMinhashDecomp {
  def main(args: Array[String]): Unit = {
    import graft.sources.Tables
    val dir = args.find(_.startsWith("/")).getOrElse("/tmp/graft_dedup500k")
    val spark = GraftSession.create()
    val par = spark.sparkContext.defaultParallelism

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[mhdecomp] $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows $n%10d")
    }

    def docs = Tables.spread(Tables.documents(spark, dir))
    def sh = docs
      .select(col("doc_id"), expr("ngram_hashes(text, 3, 'word')").as("sh"))
      .repartition(par, col("doc_id"))
    def bandRows = sh.withColumn("sig", expr("minhash_sig(sh)"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)), b =>
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))))).as(Seq("band_id", "band_hash")))
    def capped = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_id"), col("band_hash"))
        .orderBy(xxhash64(col("doc_id")), col("doc_id"))
      bandRows.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= 64).drop("__rk")
    }
    def pairs = capped.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(capped.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band_id", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

    timed("shingle")(sh.count())
    timed("sig+band")(bandRows.count())
    timed("capwindow")(capped.count())
    timed("pairs")(pairs.count())
    timed("verify") {
      val p = pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("ca", size(array_distinct(col("sh_a"))).cast("double"))
        .withColumn("cb", size(array_distinct(col("sh_b"))).cast("double"))
        .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
        .withColumn("jaccard", round(col("c") / (col("ca") + col("cb") - col("c")), 6))
        .select("doc_a", "doc_b", "jaccard")
      p.count()
    }
    spark.stop()
  }
}
