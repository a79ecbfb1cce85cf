package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling (driver extension): media payloads ride as
  * opaque `binary` columns with typed metadata alongside; decode /
  * feature-extraction runs batched per partition.
  *
  * Reference analog: `artifacts.inline_bytes BLOB` + sha256/size capture,
  * /root/reference/waddle/_run.py:160-188 (SURVEY.md §2.1 S4).
  *
  * The container has no image/audio codecs, so [[StubCodec.decode]] is a
  * clearly-marked deterministic fake — but the Spark-side plumbing is real:
  * binary column in, `mapPartitions` batch iteration (one codec init per
  * partition, the same batch shape a Pandas-UDF/`mapInPandas` pipeline
  * uses), typed `Dataset` schema out.
  */
object Multimodal {

  /** Typed record for a decoded media payload. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      sha_prefix: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feat_mean: Double)

  /** STUB CODEC — deterministic fake standing in for an image/audio decoder
    * (libs not in this container). A real deployment swaps `decode` for
    * e.g. a JNI/FFI call; everything around it (partitioned batching,
    * schema, determinism) is production-shaped.
    */
  object StubCodec {
    /** Fake-decode a payload: derives stable pseudo-metadata from content
      * bytes. Deterministic in the payload alone.
      */
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.floorMod(h, 1920)
      val height = 64 + math.floorMod(h >> 8, 1080)
      val frames = 1 + math.floorMod(h >> 16, 32)
      // fake "feature": mean of the first 64 content bytes
      val take = payload.take(64)
      val mean = if (take.isEmpty) 0.0
        else take.map(b => (b & 0xFF).toDouble).sum / take.length
      (width, height, frames, mean)
    }

    /** Fake-resize: a real codec re-encodes to the target box; the stub
      * derives a deterministic payload of proportional size. The CONTRACT
      * is what matters Spark-side: binary in → smaller binary out, same
      * row identity.
      */
    def resize(payload: Array[Byte], maxDim: Int): Array[Byte] = {
      val (w, h, _, _) = decode(payload)
      val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
      val outLen = math.max(1, (payload.length * scale * scale).toInt)
      java.util.Arrays.copyOf(payload, outLen)
    }

    /** Fake frame extraction: one pseudo-feature per sampled frame index,
      * deterministic in (payload, frameIdx).
      */
    def frameFeature(payload: Array[Byte], frameIdx: Int): Double = {
      val h = java.util.Arrays.hashCode(payload) * 31 + frameIdx
      math.floorMod(h, 100000) / 1000.0
    }
  }

  /** S4 — artifact file ingestion via the binaryFile source: read raw file
    * bytes distributed, derive the content address (sha256), size, and
    * path — the reference's artifact capture
    * (/root/reference/waddle/_run.py:160-188) as a scan instead of a
    * driver-side file read.
    * Scale: binaryFile splits by file across executors;
    * `spark.sql.files.maxPartitionBytes` packs small artifacts per task.
    */
  def ingestArtifacts(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        col("path"),
        length(col("content")).cast("long").as("size_bytes"),
        sha2(col("content"), 256).as("sha256"),
        col("modificationTime"))
      .orderBy("path")

  /** S4 — binary metadata extraction: byte length + sha256 content address,
    * all native expressions (codegen'd), oracle-verified.
    * Scale: map-only over the scan; at 100 TB the binary column lives in
    * its own parquet column chunk, so metadata queries that skip `payload`
    * never read the bytes (column pruning).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .orderBy("doc_id")

  /** S4' — batched decode pipeline over the binary column using the stub
    * codec: `mapPartitions` so codec setup happens once per partition and
    * rows stream through in batches (the JVM analog of `mapInPandas`).
    * Scale: embarrassingly parallel; partition count (not row count) bounds
    * codec initializations, and the typed output schema keeps downstream
    * plans columnar.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binarized: Dataset[(Long, Array[Byte])] =
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]

    binarized.mapPartitions { batch =>
      // one codec "initialization" per partition would go here
      batch.map { case (id, payload) =>
        val (w, h, frames, featMean) = StubCodec.decode(payload)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).take(4).map("%02x".format(_)).mkString
        MediaMeta(id, payload.length.toLong, sha, w, h, frames,
          math.rint(featMean * 1e6) / 1e6)
      }
    }.toDF()
      .orderBy("doc_id")
  }

  /** One sampled frame row. */
  case class FrameRow(doc_id: Long, frame_idx: Int, feat: Double)

  /** S4'' — frame sampling: each media payload explodes into every
    * `stride`-th frame with a per-frame feature — the video-curation shape
    * (decode once, emit rows per sampled frame) as a `flatMap` over
    * partition batches. Row count multiplies by frames/stride, which is
    * why the sampling stride is applied INSIDE the decode pass, never
    * materializing all frames.
    * Scale: map-side explode; downstream dedup/similarity treats frames
    * like documents. A real pipeline bounds memory by streaming frames per
    * payload — the iterator shape here is exactly that.
    */
  def multimodalFrames(spark: SparkSession, dir: String, stride: Int = 8): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val (_, _, frames, _) = StubCodec.decode(payload)
        (0 until frames by stride).iterator.map { f =>
          FrameRow(id, f, StubCodec.frameFeature(payload, f))
        }
      }.toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** S4''' — resize pipeline: binary in → resized binary + new metadata
    * out, batched per partition like [[multimodalDecode]].
    */
  def multimodalResize(spark: SparkSession, dir: String, maxDim: Int = 256): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val out = StubCodec.resize(payload, maxDim)
          (id, payload.length.toLong, out.length.toLong, out)
        }
      }.toDF("doc_id", "orig_bytes", "resized_bytes", "resized")
      .orderBy("doc_id")
  }
}
