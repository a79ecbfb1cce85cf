package graft.api

/** Quickstart: seed a store with a few runs (the reference's
  * examples/quickstart.py shape) and print the `ls` view.
  * Usage: runMain graft.api.Demo [storeRoot]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = graft.GraftSession.create()

    val sess = new WaddleSession(spark, root, project = "demo")
    for (i <- 1 to 3) {
      val run = sess.initRun(s"sweep-$i", Map("lr" -> s"0.0$i", "epochs" -> "10"))
      var loss = 1.0
      for (_ <- 0 until 10) {
        loss *= 0.8 + 0.02 * i
        sess.log(run, Map("loss" -> loss, "acc" -> (1.0 - loss)))
      }
      sess.logTag(run, "model", "resnet")
      sess.logArtifact(run, "weights.bin", Array.fill[Byte](64)(i.toByte))
      sess.finishRun(run, if (i == 2) "failed" else "completed")
    }
    // best-run selection (reference examples/hyperparameter_sweep.py:68:
    // min over runs of the final loss) — engine-side min_by over the
    // metric summary instead of a client-side loop
    val store = new WaddleStore(spark, root)
    val runIds = store.runs(System.currentTimeMillis() / 1000.0)
      .select("id").collect().map(_.getString(0)).toSeq
    val best = store.metricSummary(runIds)
      .where(org.apache.spark.sql.functions.col("key") === "loss")
      .agg(org.apache.spark.sql.functions.min_by(
        org.apache.spark.sql.functions.col("run_id"),
        org.apache.spark.sql.functions.col("last_value")).as("best_run"),
        org.apache.spark.sql.functions.min("last_value").as("best_loss"))
      .head()
    println(s"best run: ${best.getString(0).take(8)} loss=${best.getDouble(1)}")

    spark.stop()
    println(s"seeded store at $root")
    Cli.main(Array("ls", root, "10"))
  }
}
