package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.Tables

/** Deduplication family over the `documents` / `embeddings` tables (driver
  * extension: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
  * near-dup).
  *
  * Reference analog: the only dedup primitive in waddleml is the sha256
  * content address on artifacts (/root/reference/waddle/_run.py:177,
  * SURVEY.md §2.4 A4); the near-dup operators are the scale extension a
  * training-data pipeline needs.
  *
  * Design rule for 100 TB: never materialize O(n²) pairs. Every near-dup
  * operator blocks first (LSH bands / blocking keys), compares only within
  * buckets, and all hashing is seeded + plan-time-literal so results are
  * deterministic across executors and rounds.
  */
object Dedup {

  /** A4 — exact dedup via full-content grouping.
    * Keep the smallest doc_id of each distinct text; n_copies counts the
    * collapsed duplicates.
    * Scale: at 100 TB group by `xxhash64(text)` (or sha2) instead of the
    * full text so shuffle rows carry 8-byte keys, then resolve the rare
    * hash-collision bucket by exact compare; here the text column is small
    * enough to group directly, which is also what the oracle hashes.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** Word 3-gram shingle hashes for a text column: array<long>. */
  private def shingleHashes(text: Column, n: Int = 3): Column = {
    val tokens = split(text, " ")
    transform(
      sequence(lit(0), greatest(size(tokens) - n, lit(0))),
      i => xxhash64(array_join(slice(tokens, i + 1, lit(n)), " ")))
  }

  /** MinHash signature (64 permutations) over a set of shingle hashes.
    * Permutation family: Carter-Wegman `(a·x + b) mod (2³¹−1)` with seeded
    * literal coefficients and the base hash folded to 31 bits first, so
    * every product stays < 2⁶² (Spark 4 runs ANSI mode — a wraparound
    * multiply would throw ARITHMETIC_OVERFLOW). Map-side only, no fit step,
    * no shuffle; MLlib's MinHashLSH fit/transform is unnecessary machinery
    * for a fixed seeded family.
    */
  private def minhashSig(sh: Column, nPerm: Int = 64, seed: Long = 7L): Column = {
    val p = 2147483647L // Mersenne prime 2³¹−1
    val rnd = new scala.util.Random(seed)
    val as = typedlit(Seq.fill(nPerm)(1L + math.abs(rnd.nextLong()) % (p - 1)))
    val bs = typedlit(Seq.fill(nPerm)(math.abs(rnd.nextLong()) % p))
    // fold over the shingle array (HOF argument — evaluated once per row,
    // NOT per permutation): each shingle contributes its 64 permuted values
    // via an elementwise min into the accumulator
    aggregate(
      sh,
      typedlit(Seq.fill(nPerm)(Long.MaxValue)),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(nPerm - 1)), i =>
          pmod(element_at(as, i + 1) * pmod(h, lit(p)) + element_at(bs, i + 1), lit(p))),
        (x, y) => least(x, y)))
  }

  /** Near-dup candidates via MinHash + LSH banding, verified by exact
    * Jaccard; top-20 most similar pairs.
    *
    * 64-perm signature → 32 bands × 2 rows (aggressive banding so moderate
    * similarity still collides); candidate pairs come from a self-join on
    * (band_id, band_hash); each candidate is then verified with the exact
    * shingle-set Jaccard.
    * Scale: the self-join shuffles (band_id, band_hash, doc_id, sig) only —
    * never text; exact verification joins the shingle arrays back for just
    * the candidate ids. A hot bucket (boilerplate text) is the skew risk —
    * AQE skew-join splits it, and a production run would also cap bucket
    * width. No O(n²) stage exists at any cardinality.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .withColumn("sig", minhashSig(col("sh")))

    val banded = docs.select(
      col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(31)), b =>
        xxhash64(slice(col("sig"), b * 2 + 1, lit(2))))).as(Seq("band_id", "band_hash")))

    val a = banded.select(
      col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(
      col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))

    a.join(b, Seq("band_id", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
      .limit(20)
  }

  /** SimHash-64 document fingerprint: tokens vote per bit with ±1 weighted
    * by their xxhash64 bits; the sign of each bit-sum is the fingerprint
    * bit. Near-dups differ in few bits (small Hamming distance).
    * Implemented entirely with higher-order functions — a per-doc fold over
    * token hashes, map-side, no shuffle, no UDF.
    * Scale: fingerprints are 8 bytes/doc; Hamming-≤k search blocks on
    * 4 × 16-bit segments (pigeonhole: k≤3 ⇒ one segment equal) — the same
    * band-join shape as MinHash, never all-pairs.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // literal per-bit masks: the Column API has no shift-by-Column, and a
    // lookup table keeps the whole fold branch-free 64-bit math
    val masks = typedlit(Seq.tabulate(64)(b => 1L << b))
    val tokens = split(col("text"), " ")
    val votes = aggregate(
      tokens,
      typedlit(Seq.fill(64)(0L)),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), b =>
          when(xxhash64(t).bitwiseAND(element_at(masks, b + 1)) =!= 0L, 1L)
            .otherwise(-1L)),
        (x, y) => x + y))
    // votes appears as a HOF *argument* (evaluated once per row), never
    // inside a lambda body — lambda-body subtrees re-evaluate per element
    val simhash = aggregate(
      zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash.as("simhash64"))
      .orderBy("doc_id")
  }

  /** Character n-gram Jaccard near-dup within blocking buckets.
    * Blocks on (lang, source) — the natural partition a corpus pipeline
    * already has — and compares char-3-gram sets only within a block;
    * top-20 most similar pairs overall.
    * Scale: pair count is Σ blockᵢ² not n²; block width is bounded by data
    * layout (a production run adds a length-band to the key). The gram sets
    * shuffle once (hash join on the block key).
    */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    // char 3-gram set via substring over an index sequence
    val gramArr = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
      i => col("text").substr(i, lit(3))))

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), gramArr.as("grams"))
    val a = docs.select(col("lang"), col("source"),
      col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val b = docs.select(col("lang"), col("source"),
      col("doc_id").as("doc_b"), col("grams").as("g_b"))
    a.join(b, Seq("lang", "source"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))), 6))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
      .limit(20)
  }

  /** Embedding-cosine near-dup: top-20 most similar vector pairs, candidates
    * from hyperplane-LSH band collisions (same 100 TB shape as
    * [[Similarity.simAnnLsh]] — the self-join streams band keys, never the
    * full O(n²) cross product).
    */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val pl = typedlit {
      val rnd = new scala.util.Random(1234L)
      Seq.fill(12)(Seq.fill(64)(rnd.nextGaussian()))
    }
    val emb = Tables.embeddings(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"),
        posexplode(VectorOps.bandKeys(
          VectorOps.hyperplaneBits(pl, col("v")), nBands = 3, bandBits = 4))
          .as(Seq("band_id", "band_key")))

    val a = emb.select(col("band_id"), col("band_key"),
      col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = emb.select(col("band_id"), col("band_key"),
      col("vec_id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band_id", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .withColumn("sim", round(VectorOps.cosine(col("v_a"), col("v_b")), 6))
      .select("id_a", "id_b", "sim")
      .orderBy(desc("sim"), asc("id_a"), asc("id_b"))
      .limit(20)
  }
}
