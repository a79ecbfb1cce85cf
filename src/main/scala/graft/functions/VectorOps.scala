package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using Spark's higher-order
  * functions (SURVEY.md §2.8 F10).
  *
  * `zip_with`/`aggregate` evaluate natively inside the SQL engine (no UDF
  * serialization, no Python boundary); for 64-dim embeddings the arithmetic
  * is a tight per-row loop. If profiling ever shows this dominating, the
  * upgrade path is a codegen'd Catalyst `Expression` (SURVEY.md §7.4) — not
  * a UDF.
  *
  * All folds run left-to-right in both Spark and DuckDB
  * (`list_cosine_similarity`), so rounded results hash-match the oracle.
  */
object VectorOps {

  /** Elementwise dot product: Σ aᵢ·bᵢ. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm: √(Σ aᵢ²). */
  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Random-hyperplane signature: bit i = sign(planes(i) · v), as an
    * array<long> of 0/1. `planes` must be a literal array<array<double>>
    * column (seeded at plan time → deterministic, identical on every
    * executor with zero shuffle).
    */
  def hyperplaneBits(planes: Column, v: Column): Column =
    transform(planes, p =>
      when(aggregate(zip_with(p, v, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) >= 0, 1L)
        .otherwise(0L))

  /** Pack bit-slices of a signature into band keys: `nBands` longs, each
    * encoding `bandBits` consecutive bits. Used for LSH bucket joins.
    */
  def bandKeys(bits: Column, nBands: Int, bandBits: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)), b =>
      aggregate(
        slice(bits, b * bandBits + 1, lit(bandBits)),
        lit(0L),
        (acc, x) => acc * 2 + x))
}
