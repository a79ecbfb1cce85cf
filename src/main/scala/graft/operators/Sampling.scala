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
    * Scale: one aggregate for the floor count (broadcast back), one window
    * rank per stratum — no collect of data rows.
    */
  def balanceStrata(df: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val floor = df.groupBy(strataCol).agg(count(lit(1)).as("n"))
      .agg(min("n").as("floor_n"))
    val w = Window.partitionBy(strataCol)
      .orderBy(xxhash64(col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(floor))
      .where(col("__rk") <= col("floor_n"))
      .drop("__rk", "floor_n")
  }

  /** Deterministic sampled corpus view over `documents` (rows-only query —
    * sampling is not oracle-expressible, invariants are spec-tested).
    */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    balanceStrata(Tables.documents(spark, dir), "lang", "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
}
