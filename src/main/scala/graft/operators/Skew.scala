package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (builder prompt: "salting for skew, AQE for
  * runtime re-plan").
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on via GraftSession) — it splits
  * oversized shuffle partitions at runtime with no code change. Salting is
  * the explicit fallback for the case AQE can't fix: a single join KEY so
  * hot that one task would own it entirely (AQE splits partitions, not
  * keys, for non-broadcast shuffle joins in all cases; salting always
  * works and also pre-spreads the map-side).
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a dimension side.
    *
    * The fact side gets a deterministic salt in [0, n) derived from a
    * high-cardinality column (NOT a random — retries and oracle hashes
    * must be stable); the dimension side is replicated n× with every salt
    * value. The join key becomes (key, salt), spreading each hot key over
    * n tasks at the cost of an n× dimension replication — cheap when the
    * dimension is the small side (which is the only case where salting
    * beats just broadcasting it; for a truly small side, use broadcast).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: Column,
      nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltFrom), lit(nSalts)))
    val replicated = dim.withColumn(
      "__salt", explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
