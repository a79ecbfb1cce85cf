package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.{WaddleSession, WaddleStore}

/** The compaction protocol's promises: the bucketed production layout for
  * metrics (zero-shuffle per-run aggregates), survival of writes that land
  * MID-compaction (late tombstones and late appends), and lossless rollback
  * from a crash at any protocol point (crash-injection via the compact()
  * hook). Complements WaddleApiSpec's view-identity round trip.
  */
class CompactionSpec extends SparkSpec {

  private def freshStore(): (String, WaddleSession, WaddleStore, String, String) = {
    val root = Files.createTempDirectory("waddle-cpt").toString
    val sess = new WaddleSession(spark, root, project = "cpt")
    val r1 = sess.initRun("one", Map("lr" -> "0.1"))
    val r2 = sess.initRun("two", Map("lr" -> "0.2"))
    (0 until 5).foreach(i => sess.log(r1, Map("loss" -> (1.0 - i * 0.1))))
    (0 until 5).foreach(i => sess.log(r2, Map("loss" -> (2.0 - i * 0.1))))
    sess.finishRun(r1, "completed")
    sess.finishRun(r2, "completed")
    (root, sess, new WaddleStore(spark, root), r1, r2)
  }

  test("compacted metrics land date-partitioned + bucketed; per-run aggregate plans zero shuffle") {
    val (root, _, store, r1, _) = freshStore()
    val before = store.metrics(r1).collect().toSeq
    store.compact()
    // physical layout: metric_date= partition dirs under metrics/
    val dirs = new java.io.File(s"$root/metrics").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("metric_date=")), dirs.mkString(","))
    // catalog carries the bucket spec and the view is unchanged
    assert(spark.catalog.tableExists(WaddleStore.metricsTableName(root)))
    assert(store.metrics(r1).collect().toSeq == before)
    // the bucketed promise: grouping by the bucket key plans NO shuffle
    // (broadcast exchange for the tombstone anti-join is fine)
    val p = store.perRunMetricStats().queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"per-run aggregate over a compacted store must not shuffle:\n${p.take(2000)}")
    assert(store.perRunMetricStats().count() == 2)
  }

  test("a flush after compaction voids the bucket guarantee until the next compact") {
    val (root, sess, store, r1, _) = freshStore()
    store.compact()
    assert(spark.catalog.tableExists(WaddleStore.metricsTableName(root)))
    sess.log(r1, Map("loss" -> 0.01))
    sess.flush()
    // un-bucketed append: catalog entry dropped, view sees the new row
    assert(!spark.catalog.tableExists(WaddleStore.metricsTableName(root)))
    assert(store.metrics(r1).count() == 6)
    // re-compact restores the bucketed read
    store.compact()
    assert(spark.catalog.tableExists(WaddleStore.metricsTableName(root)))
    assert(store.metrics(r1).count() == 6)
  }

  test("tombstones and appends landing mid-compaction survive") {
    val (root, sess, store, r1, r2) = freshStore()
    val now = System.currentTimeMillis() / 1000.0
    // inject between staging and the swap: a concurrent server deletes r2
    // and a concurrent session flushes one more r1 metric
    store.compact { point =>
      if (point == "staged") {
        store.deleteRun(r2)
        sess.log(r1, Map("loss" -> 0.05))
        sess.flush()
      }
    }
    // the late tombstone survives (its file was not in the snapshot) and
    // its run is filtered from every view even though its rows were staged
    assert(new java.io.File(s"$root/deletes").exists(),
      "late tombstone file must outlive the compaction")
    assert(store.runs(now).where(col("id") === r2).count() == 0)
    assert(store.metrics(r2).count() == 0)
    // the late append was merged in, not lost with the swapped-out dir
    assert(store.metrics(r1).count() == 6,
      "metric flushed mid-compaction must survive the swap")
    // the next compaction applies the late tombstone physically
    store.compact()
    assert(!new java.io.File(s"$root/deletes").exists())
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/metrics").where(col("run_id") === r2).count() == 0)
    assert(store.metrics(r1).count() == 6)
  }

  test("crash between swap-out and swap-in: reads fall back to the backup; recovery is lossless") {
    val (_, _, store, r1, r2) = freshStore()
    val now = System.currentTimeMillis() / 1000.0
    val runsBefore = store.runs(now).orderBy("id").collect().toSeq
    val metricsBefore = store.metrics(r1).collect().toSeq
    intercept[RuntimeException] {
      store.compact { point =>
        if (point == "swapped-out:metrics") sys.error("injected crash")
      }
    }
    // the metrics dir is swapped out (lives only in .compact-old): the
    // read-only fallback keeps every view serving
    assert(store.metrics(r1).collect().toSeq == metricsBefore)
    // next compact() rolls back, then compacts cleanly — nothing lost,
    // nothing doubled
    store.compact()
    assert(store.runs(now).orderBy("id").collect().toSeq == runsBefore)
    assert(store.metrics(r1).collect().toSeq == metricsBefore)
    assert(store.metrics(r2).count() == 5)
  }

  test("flush recreating a swapped-out table dir does not defeat recovery") {
    // the history-loss hazard: crash between swap-out and swap-in leaves
    // metrics only in .compact-old; an append-mode flush() then RECREATES
    // $root/metrics holding only the new rows. Recovery must merge the
    // recreated dir's files into the restored backup — treating "cur
    // exists" as "already restored" would delete the only copy of the
    // pre-compaction history with the backup dir.
    val (_, sess, store, r1, _) = freshStore()
    val metricsBefore = store.metrics(r1).collect().toSeq
    intercept[RuntimeException] {
      store.compact { point =>
        if (point == "swapped-out:metrics") sys.error("injected crash")
      }
    }
    sess.log(r1, Map("loss" -> 0.01))
    sess.flush() // recreates the missing metrics dir with one new file
    store.compact() // runs recovery first, then compacts cleanly
    val after = store.metrics(r1).collect().toSeq
    assert(after.length == metricsBefore.length + 1,
      "pre-crash history AND the post-crash flush must both survive")
    assert(metricsBefore.toSet.subsetOf(after.toSet))
  }

  test("crash after swap-in: rollback discards staged output without row duplication") {
    val (_, _, store, r1, _) = freshStore()
    val metricsBefore = store.metrics(r1).collect().toSeq
    intercept[RuntimeException] {
      store.compact { point =>
        if (point == "swapped-in:metrics") sys.error("injected crash")
      }
    }
    // recovery alone (what a restarted process runs before compacting)
    store.recoverCompaction()
    assert(store.metrics(r1).collect().toSeq == metricsBefore,
      "rollback must restore the original files exactly once")
    store.compact()
    assert(store.metrics(r1).collect().toSeq == metricsBefore)
  }

  test("compaction maintains the O(1) version marker across crash and recovery") {
    // the marker replaced the recursive-listing fallback, so a crash
    // mid-swap must NOT leave the pre-compaction version in place: a
    // fingerprint reader would keep validating caches against a store
    // whose table dirs were actually swapped out (flush() pre-bumps for
    // exactly this reason; compact's mutation window is just longer)
    val (root, _, store, _, _) = freshStore()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ver(): String = graft.sources.StoreVersion
      .read(fs, new org.apache.hadoop.fs.Path(root))
      .getOrElse(fail("store must carry a version marker after flush"))
    val v0 = ver()
    intercept[RuntimeException] {
      store.compact { point =>
        if (point == "swapped-out:metrics") sys.error("injected crash")
      }
    }
    assert(ver() != v0,
      "a crash mid-swap must not leave the pre-compaction version claiming the store unchanged")
    val vCrashed = ver()
    store.recoverCompaction()
    assert(ver() != vCrashed,
      "rollback mutates the store and must advance the version")
    val vRecovered = ver()
    store.compact()
    assert(ver() != vRecovered,
      "a committed compaction must advance the version")
  }

  test("crash before the manifest leaves the store untouched") {
    val (root, _, store, r1, _) = freshStore()
    val metricsBefore = store.metrics(r1).collect().toSeq
    intercept[RuntimeException] {
      store.compact { point => if (point == "staged") sys.error("injected crash") }
    }
    assert(store.metrics(r1).collect().toSeq == metricsBefore)
    store.recoverCompaction()
    assert(!new java.io.File(s"$root/.compact").exists(), "staging swept")
    assert(store.metrics(r1).collect().toSeq == metricsBefore)
  }
}
