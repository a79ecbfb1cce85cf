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

  // one build attempt per (root, corpus fingerprint) per JVM; the on-disk
  // _SUCCESS probe below makes cross-JVM reuse work too
  private val building = new ConcurrentHashMap[String, String]()

  private def indexRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.ann.indexRoot")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/graft_ann")

  /** Deterministic pivots: the first [[NPivots]] vectors — a tiny pushdown
    * read (vec_id < 16 reaches the parquet scan). A production build would
    * k-means a sample; every downstream shape is identical.
    */
  def pivots(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") < NPivots.toLong)
      .select(col("vec_id").as("pivot_id"),
        col("embedding").cast("array<double>").as("pv"))

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
    val path = s"$root/${prefix}_$fp"
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
      // evict superseded fingerprints of this corpus (best-effort)
      if (fs.exists(new Path(root))) {
        fs.listStatus(new Path(root)).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"${prefix}_") && n != s"${prefix}_$fp" &&
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
