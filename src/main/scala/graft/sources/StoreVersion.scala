package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Monotonic store-version marker — the O(1) alternative to fingerprinting
  * a directory by its recursive file listing.
  *
  * [[SessionCache.dirFingerprint]] detects corpus changes by hashing the
  * recursive file listing (paths, sizes, mtimes). That is correct anywhere,
  * but a listing is O(files) namenode/object-store round trips and every
  * cache or ANN-index probe pays it — at 100 TB the listing, not the data,
  * becomes the probe cost. A MANAGED store instead carries a tiny
  * `_graft_store_version` marker holding a monotonic counter plus a random
  * nonce: readers resolve the store version with ONE file read, and write
  * paths bump the marker after every mutation ([[graft.api.WaddleSession]]
  * flush, [[graft.api.WaddleStore]] deleteRun/compact). Directories without
  * a marker — external or read-only corpora like the shared test fixtures —
  * keep the listing fallback, so correctness never depends on the marker
  * being present; only probe cost does.
  *
  * Concurrency: the marker is replaced via write-temp + rename. A reader
  * that races the swap and finds no marker (or a torn read) falls back to
  * the listing — a strictly-correct answer, just slower. The nonce makes
  * racing writers safe: two bumps that both write counter N+1 still
  * produce distinct fingerprints, so a reader can never conflate two
  * different store states that happen to share a counter.
  *
  * The reference has no analog (its store is one DuckDB file whose own
  * mtime is the version); this is the file-store realization of the same
  * "one cheap version check" property.
  */
object StoreVersion {

  /** Marker file name; the leading underscore keeps it invisible to Spark's
    * parquet directory readers (same convention as `_SUCCESS`).
    */
  val MarkerName = "_graft_store_version"

  /** The store version at `dir` as an opaque fingerprint token, or None
    * when `dir` is not a managed store (no marker). One file read, no
    * listing.
    */
  def read(fs: FileSystem, dir: Path): Option[String] = {
    val marker = new Path(dir, MarkerName)
    try {
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try {
          // read to EOF, not one read() call: a short first read is legal
          // on remote filesystems and a truncated token would drop the
          // nonce — exactly the byte that disambiguates racing bumps
          val buf = new java.io.ByteArrayOutputStream(64)
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          val s = buf.toString(StandardCharsets.UTF_8).trim
          if (s.isEmpty) None else Some("sv" + s.replace(' ', '_'))
        } finally in.close()
      }
    } catch {
      // mid-swap race or torn marker: fall back to the listing
      case _: java.io.IOException => None
    }
  }

  private def counterOf(fs: FileSystem, dir: Path): Long = {
    val raw = read(fs, dir).map(_.stripPrefix("sv"))
    raw.flatMap(_.split('_').headOption).flatMap(_.toLongOption).getOrElse(0L)
  }

  /** Advance the store version at `dir` (creating the marker on first
    * bump — this is what OPTS a directory INTO O(1) fingerprints) and drop
    * any session-cached artifacts derived from it. Write paths call this
    * after the mutation's files are fully visible, so a reader that sees
    * the new version also sees the new data.
    *
    * A lost rename race is RETRIED with a fresh counter read: each caller
    * represents a real mutation, so every bump must land — if racing bumps
    * could collapse into one, the loser's mutation would be invisible to a
    * reader that fingerprinted between the two writes. Bounded attempts;
    * on exhaustion the marker is DELETED, demoting the store to listing
    * fallback — slower, never stale.
    *
    * In-JVM bumps are serialized per directory (the deployment shape: one
    * writer process per store). CROSS-process racing writers keep version
    * DISTINCTNESS (every landed bump carries a fresh nonce) but not strict
    * counter monotonicity — a bump racing the delete/rename gap can
    * re-read a lower counter. Distinctness is the property staleness
    * detection needs; the counter is a human-readable convenience.
    */
  private val bumpLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def bump(spark: SparkSession, dir: String): Unit =
    bumpLocks.computeIfAbsent(dir, _ => new Object).synchronized {
      bumpLocked(spark, dir)
    }

  private def bumpLocked(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.mkdirs(p)
    val marker = new Path(p, MarkerName)
    var attempts = 0
    var installed = false
    while (!installed && attempts < 5) {
      attempts += 1
      val next = counterOf(fs, p) + 1
      val nonce = UUID.randomUUID().toString.take(8)
      val tmp = new Path(p, s".$MarkerName.tmp-$nonce")
      val out = fs.create(tmp, true)
      try out.write(s"$next $nonce".getBytes(StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(marker, false) // readers in the gap fall back to the listing
      installed = fs.rename(tmp, marker)
      if (!installed) fs.delete(tmp, false) // lost the race — re-read, retry
    }
    if (!installed) fs.delete(marker, false)
    SessionCache.invalidate(dir)
  }
}
