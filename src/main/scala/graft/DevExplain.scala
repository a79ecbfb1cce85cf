package graft

/** Dev tool: formatted physical plan of one registered query, printed
  * AFTER a warm run so session artifacts exist and the plan shown is the
  * one repeat invocations actually execute.
  * Usage: runMain graft.DevExplain q_name
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val name = args.find(_.startsWith("q_")).getOrElse {
      System.err.println("usage: runMain graft.DevExplain q_name")
      sys.exit(2)
    }
    val spark = GraftSession.create()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // warm artifacts + AQE-finalize
    println("[explain-start]")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    println("[explain-end]")
    spark.stop()
  }
}
