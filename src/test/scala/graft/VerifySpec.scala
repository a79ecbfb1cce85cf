package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path}

/** Pins the Verify accounting contract: every registry key yields EITHER a
  * parquet dump or a `_FAILED` marker — never silence. A query that throws
  * used to produce only an stderr line and vanish from the driver's
  * correctness report (no row at all, which hid a broken operator for two
  * rounds); this spec drives [[Verify.run]] with an injected failing query
  * to prove the failure path stays loud.
  */
class VerifySpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  // Files.list with the handle closed (the raw stream leaks a directory fd)
  private def hasParquet(dir: Path): Boolean = {
    val s = Files.list(dir)
    try s.anyMatch(_.toString.endsWith(".parquet")) finally s.close()
  }

  private def read(p: Path): String = Files.readString(p)

  test("run dumps every query and summarizes ok/failed, loudly") {
    val out = tmp("graft_verify")
    val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good_one" -> ((s, d) => graft.sources.Tables.events(s, d).limit(3)),
      "bad_one" -> ((_, _) => throw new RuntimeException("injected boom")),
      "good_two" -> ((s, d) => graft.sources.Tables.documents(s, d).limit(2)))
    val (ok, failed) = Verify.run(spark, sf, out, registry)
    assert(ok.toSet == Set("good_one", "good_two"))
    assert(failed.map(_._1) == List("bad_one"))
    // every registry key has a dump dir — success or _FAILED, never absent
    registry.keySet.foreach { n =>
      assert(Files.isDirectory(Path.of(out, n)), s"$n left no dump dir")
    }
    assert(Files.exists(Path.of(out, "bad_one", "_FAILED")))
    assert(read(Path.of(out, "bad_one", "_FAILED")).contains("injected boom"))
    assert(!Files.exists(Path.of(out, "good_one", "_FAILED")))
    Verify.writeSummary(out, ok, failed)
    val summary = read(Path.of(out, "verify_summary.json"))
    assert(summary.contains(""""failed": ["bad_one"]"""))
    assert(summary.contains("injected boom"))
  }

  test("a failure clears the previous run's dump — stale parquet never outlives _FAILED") {
    val out = tmp("graft_verify3")
    val good: Map[String, (SparkSession, String) => DataFrame] = Map(
      "flaky" -> ((s, d) => graft.sources.Tables.region(s, d)))
    Verify.run(spark, sf, out, good)
    assert(hasParquet(Path.of(out, "flaky")))
    // second run into the SAME outDir: the query now throws at plan time,
    // before any write could truncate the old dump
    val bad: Map[String, (SparkSession, String) => DataFrame] = Map(
      "flaky" -> ((_, _) => throw new RuntimeException("regressed")))
    Verify.run(spark, sf, out, bad)
    assert(Files.exists(Path.of(out, "flaky", "_FAILED")))
    assert(!hasParquet(Path.of(out, "flaky")),
      "stale run-1 parquet survived next to the run-2 _FAILED marker")
  }

  test("every registry key is covered by the accounting (none filtered away)") {
    // name-filter intersects, never drops silently: a filter naming an
    // unknown query yields zero dumps for it, visible as absence from BOTH
    // ok and failed lists of the run's return — assert the full-run
    // invariant ok ∪ failed == registry keys on a tiny two-query registry.
    val out = tmp("graft_verify2")
    val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
      "a" -> ((s, d) => graft.sources.Tables.region(s, d)),
      "b" -> ((s, d) => graft.sources.Tables.nation(s, d)))
    val (ok, failed) = Verify.run(spark, sf, out, registry)
    assert((ok.toSet ++ failed.map(_._1)) == registry.keySet)
  }
}
