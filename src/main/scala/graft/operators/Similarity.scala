package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.Tables

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (driver extension; SURVEY.md §2.6 O4).
  *
  * Two tiers:
  *  - [[simTopK]]: exact brute-force cosine top-k — the correctness baseline,
  *    oracle-verified against DuckDB `list_cosine_similarity`.
  *  - [[simAnnLsh]]: random-hyperplane LSH — the 100 TB path. Signatures are
  *    computed map-side from plan-time literal hyperplanes; candidate
  *    retrieval is a bucket equi-join on band keys instead of an O(n) scan
  *    per query (or O(n²) all-pairs).
  */
object Similarity {

  /** Embedding-column statistics: per-label vector count and L2-norm
    * min/avg/max — the sanity profile a pipeline runs before trusting an
    * embedding table (catches unnormalized / zero vectors per class).
    * Determinism: the per-row norm is a left-fold over 64 elements
    * (same order both engines); the cross-row average routes each norm
    * through DECIMAL(28,12) so the SUM is exact and order-insensitive —
    * `avg(double)` would be partial-sum-order dependent. min/max are exact
    * comparisons, safe as doubles.
    * Scale: one map pass + one hash aggregate with map-side partials.
    */
  def vectorNorms(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    Tables.embeddings(spark, dir)
      .select(col("label"), norm.as("norm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(min("norm"), 6).as("min_norm"),
        round(sum(col("norm").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("avg_norm"),
        round(max("norm"), 6).as("max_norm"))
      .orderBy("label")
  }

  private def withVec(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))

  /** O4 — exact cosine top-k for query vector vec_id=0.
    * Scale: the single query row is broadcast; similarity is evaluated
    * map-side over the corpus scan and the global top-k is
    * TakeOrderedAndProject (per-partition heaps, driver merges k rows, never
    * the corpus). Rounded similarity + vec_id tiebreak keep the boundary
    * deterministic for the oracle hash.
    */
  def simTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = withVec(spark, dir)
    val q = emb.where(col("vec_id") === 0L).select(col("v").as("qv"))
    emb.where(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        round(expr("cosine_sim(v, qv)"), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** O4'' — IVF (inverted-file) ANN: coarse quantization over deterministic
    * pivot vectors, probe the query's nearest clusters only.
    *
    * Pivots are the first 16 vectors (deterministic; a production build
    * would k-means a sample — the plumbing is identical). The codebook —
    * ONE row holding all 16 (pivot_id, centroid) entries — broadcasts, and
    * assignment is map-side: 16 cosines + an argmax per vector on its own
    * row. No row fan, and the vector payload never enters a shuffle after
    * the deliberate scan-spread repartition (the earlier form fanned each
    * vector ×16 and re-collapsed with a groupBy(vec_id) that shuffled
    * every vector). The query probes nprobe=2 clusters, so the exact
    * re-rank touches ~2/16 of the corpus.
    * Scale: the IVF index is `(cluster, vec)` — written partitioned by
    * cluster, a query reads only its probed partitions (partition pruning
    * does the "inverted file" part); nothing collects to the driver.
    */
  def simAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = withVec(spark, dir).repartition(spark.sparkContext.defaultParallelism, col("vec_id")).select("vec_id", "v")
    val pivots = emb.where(col("vec_id") < 16L)
      .select(col("vec_id").as("pivot_id"), col("v").as("pv"))
    // codebook as a single row; sort makes collect_list order irrelevant
    val codebook = pivots.groupBy()
      .agg(array_sort(collect_list(struct(col("pivot_id"), col("pv")))).as("pvs"))

    val assigned = emb
      .crossJoin(broadcast(codebook)) // 1-row codebook: zero fan
      .withColumn("cluster", expr(
        // argmax by (similarity, pivot_id): same tie-break as max_by over
        // struct(psim, pivot_id); evaluated once per codebook entry
        "array_max(transform(pvs, p -> struct(cosine_sim(v, p.pv) AS s, p.pivot_id AS pid))).pid"))
      .drop("pvs")

    val q = emb.where(col("vec_id") === 0L).select(col("v").as("qv"))
    val probe = pivots.crossJoin(broadcast(q))
      .select(col("pivot_id"), expr("cosine_sim(pv, qv)").as("psim"))
      .orderBy(desc("psim"), asc("pivot_id"))
      .limit(2)
      .select(col("pivot_id").as("cluster"))

    assigned
      .join(broadcast(probe), Seq("cluster"))
      .where(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(expr("cosine_sim(v, qv)"), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** O4' — LSH-bucketed ANN for the same query (rows-only check; the brute
    * twin above is the oracle-verified baseline and its recall reference).
    *
    * 16 hyperplane bits → 4 bands × 4 bits; candidates = corpus rows sharing
    * ≥1 band key with the query; exact cosine re-rank of candidates only.
    * Scale: corpus signatures are computed once map-side (at 100 TB:
    * persisted/bucketed by band key so a query touches ~n/2⁴ rows per band);
    * the bucket join shuffles only band keys + ids, and the re-rank touches
    * the few colliding vectors. Multi-probe = more bands, not more scan.
    */
  def simAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = withVec(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .withColumn("bands", VectorOps.bandKeys(
        expr("hyperplane_bits(v, 16, 42)"), nBands = 4, bandBits = 4))

    val corpus = emb.select(
      col("vec_id"), col("v"),
      posexplode(col("bands")).as(Seq("band_id", "band_key")))
    val qBands = emb.where(col("vec_id") === 0L).select(
      col("v").as("qv"),
      posexplode(col("bands")).as(Seq("band_id", "band_key")))

    corpus
      .join(broadcast(qBands), Seq("band_id", "band_key"))
      .where(col("vec_id") =!= 0L)
      .groupBy("vec_id")
      .agg(first("v").as("v"), first("qv").as("qv"))
      .select(
        col("vec_id"),
        round(expr("cosine_sim(v, qv)"), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }
}
