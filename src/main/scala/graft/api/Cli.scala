package graft.api

import org.apache.spark.sql.functions._

/** `waddle ls` analog (/root/reference/waddle/cli.py:41-75): recent runs
  * with humanized duration and truncated ids, printed fixed-width.
  * Usage: runMain graft.api.Cli <storeRoot> [limit]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: Cli <storeRoot> [limit]"))
    val limit = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.GraftSession.create()
    val store = new WaddleStore(spark, root)
    val now = System.currentTimeMillis() / 1000.0

    // duration humanize (cli.py:62-68) + id truncation (cli.py:71-72),
    // engine-side instead of Python string-formatting loops
    val rows = store.listRuns(now, limit = limit)
      .withColumn("dur_sec",
        when(col("ended_at").isNotNull, col("ended_at") - col("started_at")))
      .withColumn("duration",
        when(col("dur_sec").isNull, lit("-"))
          .when(col("dur_sec") < 60, concat(round(col("dur_sec"), 1), lit("s")))
          .otherwise(concat(floor(col("dur_sec") / 60).cast("long"), lit("m"))))
      .select(
        substring(col("id"), 1, 8).as("id"),
        col("project"), col("name"), col("status"), col("duration"))
      .collect()

    println(f"${"ID"}%-10s${"PROJECT"}%-12s${"NAME"}%-20s${"STATUS"}%-10s${"DUR"}%-8s")
    rows.foreach { r =>
      println(f"${r.getString(0)}%-10s${r.getString(1)}%-12s${
        Option(r.getString(2)).getOrElse("-")}%-20s${r.getString(3)}%-10s${
        r.getString(4)}%-8s")
    }
    spark.stop()
  }
}
