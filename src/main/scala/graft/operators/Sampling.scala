package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sampling operators for training-data curation (class balancing, corpus
  * downsampling) — deterministic by construction: membership is a pure
  * function of a row's own key hash, never of partitioning, task order, or
  * an RNG stream, so a sample is reproducible across runs, retries, and
  * cluster layouts (unlike `df.sample`, whose draw depends on row order
  * within partitions).
  */
object Sampling {

  /** Keep ~`fraction` of rows, decided by the key's hash bucket:
    * xxhash64(key, seed) mod 1e6 < fraction·1e6. Same key ⇒ same verdict
    * in every run and on every replica — which also makes the sample
    * stable under re-partitioning and incremental reruns.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame =
    df.where(
      pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L)) <
        (fraction * 1000000L).toLong)

  /** Per-stratum fractions (e.g. downsample the dominant language):
    * unspecified strata keep everything.
    */
  def stratifiedSample(
      df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Int): DataFrame = {
    val frac = fractions.foldLeft(lit(1.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.where(
      pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L)).cast("double") <
        frac * 1000000.0)
  }

  /** Deterministic class-balanced corpus: cap every stratum at the size of
    * the smallest one, keeping the lowest key-hashes (a stable choice, not
    * an arbitrary head).
    *
    * Scale: selection is histogram-driven, NOT a whole-stratum sort. A
    * whole-stratum `row_number` window would sort the entire corpus inside
    * |strata| partitions (5 languages ⇒ 5 reducers own 100 TB — maximal
    * skew). Instead:
    *   1. one map-side aggregate builds a (stratum × 4096 coarse hash
    *      buckets) histogram — bucket ids are monotone in signed-hash
    *      order, so per-stratum cumulative counts locate the single
    *      bucket containing the floor_n-th smallest hash exactly;
    *   2. that boundary (one row per stratum) broadcasts back: rows in
    *      buckets below it pass with no ranking at all, and only rows
    *      inside the boundary bucket (≈ stratum/4096 of the data) get an
    *      exact (hash, key) rank — the window partitions by
    *      (stratum, bucket), so no reducer ever holds more than one
    *      bucket's sliver.
    * Output is identical to the naive form: exactly the floor_n lowest
    * (hash, key) rows per stratum, deterministic and partition-independent.
    */
  def balanceStrata(df: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 2^52 shift → 4096 buckets; XOR with Long.MinValue maps signed hash
    // order onto unsigned order so bucket ids sort the same way hashes do
    val hash = xxhash64(col(keyCol))
    val bucket = shiftrightunsigned(hash.bitwiseXOR(lit(Long.MinValue)), 52)
    val withB = df.withColumn("__h", hash).withColumn("__b", bucket)

    // histogram-sized from here down (≤ |strata| × 4096 rows)
    val hist = withB.groupBy(col(strataCol), col("__b")).agg(count(lit(1)).as("__c"))
    val floor = hist.groupBy(strataCol).agg(sum("__c").as("__n"))
      .agg(min("__n").as("__floor_n"))
    val wCum = Window.partitionBy(strataCol).orderBy("__b")
    val boundary = hist.crossJoin(broadcast(floor))
      .withColumn("__cum", sum("__c").over(wCum))
      .where(col("__cum") - col("__c") < col("__floor_n") &&
        col("__cum") >= col("__floor_n"))
      .select(col(strataCol).as("__s"), col("__b").as("__bb"),
        (col("__floor_n") - (col("__cum") - col("__c"))).as("__take"))

    // one pass over the data: keep everything below the boundary bucket,
    // rank only inside it — (stratum, bucket) partitioning has no skew
    val wEdge = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(keyCol))
    // null-safe equality: a NULL stratum is a stratum of its own (the
    // histogram and the windows already group it as one) — plain === would
    // silently drop every null-stratum row at this join
    withB.join(broadcast(boundary), col(strataCol) <=> col("__s"))
      .where(col("__b") <= col("__bb"))
      .withColumn("__rk", row_number().over(wEdge))
      .where(col("__b") < col("__bb") || col("__rk") <= col("__take"))
      .drop("__h", "__b", "__s", "__bb", "__take", "__rk")
  }

  /** Deterministic sampled corpus view over `documents` (rows-only query —
    * sampling is not oracle-expressible, invariants are spec-tested).
    */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    balanceStrata(Tables.documents(spark, dir), "lang", "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
}
