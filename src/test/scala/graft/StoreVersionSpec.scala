package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import graft.api.WaddleSession
import graft.operators.AnnIndex
import graft.sources.{SessionCache, StoreVersion}

/** StoreVersion contract: a marker-carrying (managed) store is
  * fingerprinted in O(1) — one marker read, ZERO recursive listings — and
  * the marker is the staleness signal; unmanaged directories keep the
  * listing fallback. The assertion style counts actual fallback listings
  * via SessionCache.fallbackListings.
  */
class StoreVersionSpec extends SparkSpec {

  private def fp(dir: String): String =
    SessionCache.dirFingerprint(spark, dir)

  private def listings: Long = SessionCache.fallbackListings.get()

  test("managed store: one marker read per probe, no listings; bump changes the fingerprint") {
    val dir = Files.createTempDirectory("sv-managed").toString
    Files.writeString(Paths.get(dir, "data.txt"), "payload")
    StoreVersion.bump(spark, dir)

    val before = listings
    val v1 = fp(dir)
    val v1again = fp(dir)
    assert(v1.startsWith("sv"), s"marker-backed fingerprint expected, got $v1")
    assert(v1 == v1again, "stable fingerprint while the version is unchanged")
    assert(listings == before,
      "a managed store must be probed without recursive listings")

    // data mutated + marker bumped → new fingerprint, still zero listings
    Files.writeString(Paths.get(dir, "data2.txt"), "more")
    StoreVersion.bump(spark, dir)
    val v2 = fp(dir)
    assert(v2 != v1, "bump must advance the fingerprint")
    assert(listings == before, "the bumped probe is still listing-free")
    // the counter is monotonic — every bump lands (a lost rename race
    // retries), so N mutations are N distinguishable versions
    assert(v1.startsWith("sv1_") && v2.startsWith("sv2_"),
      s"monotonic counters expected, got $v1 / $v2")
  }

  test("unmanaged dir: every probe pays a listing and appended files are detected") {
    val dir = Files.createTempDirectory("sv-unmanaged").toString
    Files.writeString(Paths.get(dir, "a.txt"), "x")
    val before = listings
    val v1 = fp(dir)
    fp(dir)
    assert(listings == before + 2,
      "unmanaged probes fall back to one listing each")
    Files.writeString(Paths.get(dir, "b.txt"), "y")
    assert(fp(dir) != v1, "fallback listing must detect the appended file")
  }

  test("racing/torn marker reads fall back to the listing, never a wrong answer") {
    val dir = Files.createTempDirectory("sv-torn").toString
    Files.writeString(Paths.get(dir, "a.txt"), "x")
    // an empty marker (crash between create and write) must not be trusted
    Files.writeString(Paths.get(dir, StoreVersion.MarkerName), "")
    val before = listings
    val v = fp(dir)
    assert(!v.startsWith("sv") || v == "sv", "torn marker must not produce a version token")
    assert(listings == before + 1, "torn marker falls back to the listing")
  }

  test("SessionCache artifacts ride the marker: hit while version holds, rebuild after bump") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sv-cache").toString
    Seq(1, 2, 3).toDF("x").write.mode("overwrite").parquet(s"$dir/t")
    StoreVersion.bump(spark, dir)

    var builds = 0
    def artifact() = SessionCache.cached(spark, "sv_spec_artifact", dir) {
      builds += 1
      spark.read.parquet(s"$dir/t")
    }
    assert(artifact().count() == 3)
    val before = listings
    assert(artifact().count() == 3)
    assert(builds == 1 && listings == before,
      "cache probe on a managed store must hit without a listing")

    Seq(4, 5).toDF("x").write.mode("append").parquet(s"$dir/t")
    StoreVersion.bump(spark, dir)
    assert(artifact().count() == 5, "bumped version must rebuild the artifact")
    assert(builds == 2)
  }

  test("AnnIndex probes a managed corpus without listings; bump invalidates the index") {
    val corpus = Files.createTempDirectory("sv-ann")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"),
      corpus.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val dir = corpus.toString
    StoreVersion.bump(spark, dir)

    val path1 = AnnIndex.ensureIvf(spark, dir)
    val before = listings
    assert(AnnIndex.ensureIvf(spark, dir) == path1)
    AnnIndex.ensureLsh(spark, dir)
    assert(listings == before,
      "index re-probes of a managed corpus must not pay a recursive listing")

    // corpus change + bump → fresh index version (path embeds the version)
    Files.write(corpus.resolve("embeddings_2.parquet"),
      Files.readAllBytes(corpus.resolve("embeddings.parquet")))
    StoreVersion.bump(spark, dir)
    assert(AnnIndex.ensureIvf(spark, dir) != path1,
      "bumped corpus version must produce a fresh index")
  }

  test("WaddleSession writes maintain the marker: flush and deleteRun bump it") {
    val root = Files.createTempDirectory("sv-waddle").toString
    val sess = new WaddleSession(spark, root)
    val run = sess.initRun("sv-run")
    sess.log(run, Map("loss" -> 1.0))
    sess.flush()

    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(StoreVersion.read(fs, new Path(root)).isDefined,
      "flush must establish the O(1) version marker")
    val v1 = fp(root)
    assert(v1.startsWith("sv"))

    sess.log(run, Map("loss" -> 0.5))
    sess.flush()
    val v2 = fp(root)
    assert(v2 != v1, "a second flush must advance the store version")

    new graft.api.WaddleStore(spark, root).deleteRun(run)
    assert(fp(root) != v2, "deleteRun must advance the store version")
  }
}
