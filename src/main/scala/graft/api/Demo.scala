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
    spark.stop()
    println(s"seeded store at $root")
    Cli.main(Array(root, "10"))
  }
}
