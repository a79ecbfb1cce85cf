package graft.operators

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{SessionCache, Tables}

/** Materialized ANN index for the `embeddings` corpus.
  *
  * An ANN query must NOT touch the whole corpus — that is the entire point
  * of approximate search. The round-4 batch operators had the right probe
  * shape but recomputed every vector's coarse assignment per query (16
  * cosines/row IVF, 16 hyperplane dots/row LSH): invisible at sf0.1, a
  * full unpruned corpus scan per query at 100 TB. This object is the
  * index build the probes read instead:
  *
  *  - IVF: the corpus, assigned once to its nearest pivot, written as a
  *    parquet directory PARTITIONED BY cluster — the partition layout IS
  *    the inverted file, identical to what the streaming ingester
  *    ([[graft.streaming.Streams.annIngestSink]]) appends. A probe joins
  *    the index against its ≤ nprobe probed cluster ids and Spark's
  *    dynamic partition pruning reduces the scan to those directories;
  *    the other 14/16ths of the corpus are never opened.
  *  - LSH: the banded signature frame (vec_id, band_id, band_key) as a
  *    [[SessionCache]] artifact — KEY-ONLY (24 B/row), never the vector
  *    payload, mirroring the dedup discipline: candidates are found on
  *    keys, payloads join back for the few candidates only.
  *
  * Build-once discipline: the index path is keyed by the corpus
  * fingerprint (same listing hash as SessionCache staleness), so appended
  * data gets a fresh index and repeated queries inside a session —
  * and across JVMs sharing the index root — reuse the built one.
  * A production deployment runs the build as its ingestion job (or lets
  * the streaming ingester grow the same layout) and version-swaps the
  * directory on re-clustering; `spark.graft.ann.indexRoot` points at it.
  */
object AnnIndex {

  /** Pivot count (coarse clusters) and probe width. 16/2 match the round-3
    * operators; production tunes √n pivots and recall-driven nprobe.
    */
  val NPivots = 16
  val NProbe = 2

  /** k-means build parameters: Lloyd iterations over a deterministic
    * pushdown-pruned sample (`vec_id < SampleIds` reaches the parquet
    * scan). 4 iterations is where the sample's assignment churn flatlines
    * at this dimensionality; production tunes sample size ∝ k.
    */
  val KmeansIters = 4
  val SampleIds = 4096L

  // one build attempt per (root, corpus fingerprint) per JVM; the on-disk
  // _SUCCESS probe below makes cross-JVM reuse work too
  private val building = new ConcurrentHashMap[String, String]()
  // codebook per (dir, corpus fingerprint): the probe and the index build
  // MUST score against identical pivots
  private val centroidCache = new ConcurrentHashMap[String, Seq[Array[Double]]]()

  private def indexRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.ann.indexRoot")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/graft_ann")

  /** Sampled k-means centroids (Lloyd), the real IVF codebook build:
    *  - sample = `vec_id < SampleIds`, a partition-prunable predicate that
    *    reaches the parquet scan — no corpus pass, no driver-side corpus;
    *  - seed = the first [[NPivots]] sample vectors (deterministic);
    *  - each iteration assigns the sample map-side against the broadcast
    *    codebook (same argmax as [[assign]]) and recomputes per-dimension
    *    means with DECIMAL-exact sums, so centroids are bit-stable under
    *    any partitioning — a float partial-sum wobble here would flip
    *    borderline cell assignments between the on-disk index and a fresh
    *    probe codebook across JVMs;
    *  - only k×dim doubles ever reach the driver (the centroids), per
    *    iteration; empty cells keep their previous centroid.
    * Cached per corpus version (same fingerprint key as [[ensureIvf]]).
    */
  def centroids(spark: SparkSession, dir: String): Seq[Array[Double]] = {
    val key = s"$dir|${SessionCache.dirFingerprint(spark, dir)}"
    centroidCache.computeIfAbsent(key, _ => {
      val sample = Tables.embeddings(spark, dir)
        .where(col("vec_id") < SampleIds)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      var cents: Seq[Array[Double]] = sample
        .where(col("vec_id") < NPivots.toLong)
        // dropDuplicates: an appended corpus may repeat ids (same vector)
        .dropDuplicates("vec_id").orderBy("vec_id").limit(NPivots)
        .collect().map(_.getSeq[Double](1).toArray).toSeq
      val k = cents.size // corpus smaller than NPivots degrades gracefully
      for (_ <- 1 to KmeansIters) {
        val means = assign(sample, codebookOf(spark, cents))
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos")
          .agg((sum(col("x").cast("decimal(28,12)")) /
            count(lit(1))).cast("double").as("m"))
          .collect()
          .groupBy(_.getAs[Long]("cluster"))
          .map { case (c, rows) =>
            c.toInt -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m"))
          }
        cents = (0 until k).map(c => means.getOrElse(c, cents(c).clone()))
      }
      // round for cross-run stability at the cell boundary
      cents.map(_.map(x => math.rint(x * 1e6) / 1e6))
    })
  }

  private def codebookOf(spark: SparkSession, cents: Seq[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("pivot_id", "pv")
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pivot_id"), col("pv")))).as("pvs"))
  }

  /** The codebook pivots as a frame (probe side scores the query against
    * these — identical vectors to the ones the index was built with).
    */
  def pivots(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    centroids(spark, dir).zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("pivot_id", "pv")
  }

  /** The codebook as ONE row holding all (pivot_id, centroid) entries —
    * broadcasts for map-side assignment with zero row fan. array_sort
    * makes collect_list order irrelevant.
    */
  def codebook(spark: SparkSession, dir: String): DataFrame =
    pivots(spark, dir).groupBy()
      .agg(array_sort(collect_list(struct(col("pivot_id"), col("pv")))).as("pvs"))

  /** Map-side coarse assignment: argmax by (similarity, pivot_id) on the
    * row itself — no fan, no aggregate, the vector payload never shuffles.
    * Shared verbatim by the streaming ingester
    * ([[graft.streaming.Streams.annIngest]]) so batch builds and streamed
    * appends land in the same cells.
    */
  def assign(vectors: DataFrame, codebook: DataFrame): DataFrame =
    vectors
      .crossJoin(broadcast(codebook)) // 1-row codebook: zero fan
      .withColumn("cluster", expr(
        "array_max(transform(pvs, p -> struct(cosine_sim(v, p.pv) AS s, p.pivot_id AS pid))).pid"))
      .drop("pvs")

  /** Read schema for the inverted file. `cluster` is declared INT (its
    * values are pivot ids < 16) so the partition-column type never depends
    * on discovery inference, and probe keys compare without casts —
    * a cast around the partition column would defeat pruning.
    */
  private val IvfSchema = "vec_id BIGINT, v ARRAY<DOUBLE>, cluster INT"

  /** Ensure the cluster-partitioned inverted file exists for the corpus at
    * `dir`; returns its path. Builds at most once per corpus VERSION
    * (fingerprint): one full-corpus assignment pass, partitioned write,
    * atomic rename into place. Concurrent builders race benignly — the
    * loser's staging dir is discarded. Superseded versions of the same
    * corpus are deleted so appends don't leak old indexes.
    */
  def ensureIvf(spark: SparkSession, dir: String): String = {
    val fp = SessionCache.dirFingerprint(spark, dir)
    val prefix = s"ivf_${Integer.toHexString(dir.hashCode)}"
    val root = indexRoot(spark)
    // the index version folds in a CODEBOOK hash, not just the corpus
    // fingerprint: a pivot-build change (or retrained centroids) must
    // invalidate an on-disk index built against the old codebook, or
    // probes would score against pivots the cells were never assigned to
    val cb = centroids(spark, dir)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    cb.foreach(_.foreach(x => md.update(java.nio.ByteBuffer.allocate(8).putDouble(x).array())))
    val cbHash = md.digest().take(4).map("%02x".format(_)).mkString
    val path = s"$root/${prefix}_${fp}_$cbHash"
    building.computeIfAbsent(path, _ => {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(p, "_SUCCESS"))) {
        if (fs.exists(p)) fs.delete(p, true) // crashed partial build
        val staging = new Path(s"$path.build-${UUID.randomUUID().toString.take(8)}")
        assign(
          Tables.embeddings(spark, dir)
            // scan-spread: embeddings.parquet arrives in few splits and the
            // 16-cosine assignment is the compute — spread it over all cores
            .repartition(spark.sparkContext.defaultParallelism)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
          codebook(spark, dir))
          .withColumn("cluster", col("cluster").cast("int"))
          .write.mode("overwrite").partitionBy("cluster").parquet(staging.toString)
        if (!fs.rename(staging, p)) fs.delete(staging, true) // lost the race
      }
      // evict superseded versions of this corpus — older fingerprints AND
      // older codebooks (best-effort)
      if (fs.exists(new Path(root))) {
        fs.listStatus(new Path(root)).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"${prefix}_") && n != s"${prefix}_${fp}_$cbHash" &&
              !n.contains(".build-"))
            fs.delete(st.getPath, true)
        }
      }
      path
    })
  }

  /** The inverted file as a DataFrame: explicit schema (see [[IvfSchema]])
    * over the partitioned directory.
    */
  def ivf(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(IvfSchema).parquet(ensureIvf(spark, dir))

  /** LSH banded signatures as a KEY-ONLY SessionCache artifact:
    * (vec_id, band_id, band_key), 4 bands × 4 hyperplane bits, computed
    * once per (session, corpus version). The materialization is also a
    * pushdown barrier: no probe predicate can be rewritten below the
    * hyperplane fold. 24 B/row × 4 rows/vector — orders of magnitude under
    * the corpus, the SessionCache size discipline. At 100 TB the same frame
    * is a parquet table bucketed by band_key (the banding here and the
    * layout there are the same artifact).
    */
  def lshBands(spark: SparkSession, dir: String): DataFrame =
    SessionCache.cached(spark, "lsh_bands", dir) {
      Tables.embeddings(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"),
          posexplode(graft.functions.VectorOps.bandKeys(
            expr("hyperplane_bits(cast(embedding as array<double>), 16, 42)"),
            nBands = 4, bandBits = 4)).as(Seq("band_id", "band_key")))
    }
}
