package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.api.{WaddleSession, WaddleStore}

/** End-to-end façade round trip, mirroring the reference's API tests
  * (/root/reference/tests/test_api.py:56-72 — init→log→finish then verify
  * by direct query).
  */
class WaddleApiSpec extends SparkSpec {

  test("init -> log -> finish round trip") {
    val root = Files.createTempDirectory("waddle").toString
    val sess = new WaddleSession(spark, root, project = "proj1")

    val run = sess.initRun("exp-1", Map("lr" -> "0.01", "epochs" -> "100"))
    sess.log(run, Map("loss" -> 0.5, "acc" -> 0.7))        // step 0
    sess.log(run, Map("loss" -> 0.4, "acc" -> 0.8))        // step 1
    sess.log(run, Map("loss" -> 0.35), step = Some(10))    // explicit step
    sess.logParam(run, "lr", "0.02")                       // upsert wins
    sess.logTag(run, "model", "resnet")
    sess.logArtifact(run, "weights.bin", "model weights".getBytes)
    sess.finishRun(run, "completed")

    val store = new WaddleStore(spark, root)
    val now = System.currentTimeMillis() / 1000.0

    val runRow = store.runs(now).where(col("id") === run).head()
    assert(runRow.getAs[String]("status") == "completed")
    assert(runRow.getAs[String]("project") == "proj1")

    val m = store.metrics(run).collect()
    assert(m.length == 5)
    val lossSteps = m.filter(_.getAs[String]("key") == "loss").map(_.getAs[Int]("step"))
    assert(lossSteps.sorted.sameElements(Array(0, 1, 10)))

    // keep-latest upsert: lr was set at init then overwritten
    val params = store.latestKv("param").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(params("lr") == "0.02" && params("epochs") == "100")
    assert(store.latestKv("tag").head().getAs[String]("value") == "resnet")

    // artifact: sha256 of the exact bytes (reference test_api.py:146-160)
    val art = store.artifacts(run).head()
    val wantSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("model weights".getBytes).map("%02x".format(_)).mkString
    assert(art.getAs[String]("sha256") == wantSha)
    assert(art.getAs[Long]("size_bytes") == "model weights".getBytes.length.toLong)
  }

  test("running run with stale metrics shows aborted at read time") {
    val root = Files.createTempDirectory("waddle").toString
    val sess = new WaddleSession(spark, root)
    val run = sess.initRun("stale-run")
    sess.log(run, Map("loss" -> 1.0))
    sess.flush() // still 'running'

    val store = new WaddleStore(spark, root)
    val farFuture = System.currentTimeMillis() / 1000.0 + 10_000
    assert(store.runs(farFuture).head().getAs[String]("status") == "aborted")
    // within the threshold it is still running
    val now = System.currentTimeMillis() / 1000.0
    assert(store.runs(now, staleAfterSec = 10_000).head()
      .getAs[String]("status") == "running")
  }
}
