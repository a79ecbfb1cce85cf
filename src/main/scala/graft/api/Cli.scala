package graft.api

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `waddle` CLI analog (/root/reference/waddle/cli.py): `init`, `ls`,
  * `serve`, with the same store-discovery rule — explicit path first, then
  * the working directory, then up to 10 ancestors (cli.py:103-124). The
  * store is a `.waddle/store` directory of Parquet tables instead of the
  * reference's single DuckDB file.
  *
  * Usage: runMain graft.api.Cli init [path]
  *        runMain graft.api.Cli ls [storeRoot] [limit]
  *        runMain graft.api.Cli serve [storeRoot] [port]
  *        runMain graft.api.Cli compact [storeRoot]
  */
object Cli {

  /** Store location relative to a project root (reference: `.waddle/waddle.duckdb`). */
  val StoreRel = ".waddle/store"

  /** Bootstrap a store directory and gitignore it
    * (reference cmd_init, cli.py:18-36). Idempotent. Returns the store path.
    */
  def init(path: String): String = {
    val root = new File(path).getAbsoluteFile
    val store = new File(root, StoreRel)
    Files.createDirectories(store.toPath)
    val gi = new File(root, ".gitignore")
    val txt = if (gi.exists()) Files.readString(gi.toPath) else ""
    if (!txt.linesIterator.contains(".waddle/")) {
      val base = if (txt.isEmpty) "" else txt.stripSuffix("\n") + "\n"
      Files.writeString(gi.toPath, base + ".waddle/\n")
    }
    store.getAbsolutePath
  }

  /** Find the store: an explicit path is authoritative — if it does not
    * exist that's an ERROR, not a trigger for the ancestor walk (a typo'd
    * path silently serving some other store is worse than failing). With no
    * explicit path, walk from `cwd` up to 10 ancestors looking for
    * `.waddle/store` (reference _find_db, cli.py:103-124).
    */
  def discoverStore(
      explicit: Option[String] = None,
      cwd: String = sys.props("user.dir")): Option[String] = explicit match {
    case Some(p) =>
      val f = new File(p)
      require(f.exists(), s"store path does not exist: $p")
      Some(f.getAbsolutePath)
    case None =>
      Iterator.iterate(new File(cwd).getAbsoluteFile)(_.getParentFile)
        .takeWhile(_ != null).take(10)
        .map(p => new File(p, StoreRel))
        .find(_.exists())
        .map(_.getAbsolutePath)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "init" :: rest =>
      println(s"initialized ${init(rest.headOption.getOrElse("."))}")

    case "ls" :: rest =>
      val (root, limit) = rootAndArg(rest, default = 20)
      val spark = graft.GraftSession.create()
      try ls(spark, root, limit) finally spark.stop()

    case "serve" :: rest =>
      val (root, port) = rootAndArg(rest, default = 8350)
      val spark = graft.GraftSession.create()
      val srv = new DashboardServer(spark, root, port)
      srv.start()
      srv.attachLiveFromStore()
      println(s"graft dashboard listening on 127.0.0.1:${srv.boundPort} over $root")
      Thread.currentThread().join()

    case "compact" :: rest =>
      val root = discoverStore(rest.headOption).getOrElse(
        sys.error(s"no $StoreRel found here or in 10 ancestors; run `Cli init` first"))
      val spark = graft.GraftSession.create()
      try {
        new WaddleStore(spark, root).compact()
        println(s"compacted $root")
      } finally spark.stop()

    // maintenance pass for grow-in-place partition layouts (streamed ANN
    // indexes, dedup band stores, shard tails) — NOT the Waddle store
    // (`compact` above owns that, with its manifest/recovery machinery)
    case "compact-layout" :: path :: rest =>
      val maxFiles = rest.headOption.map(_.toInt).getOrElse(4)
      val spark = graft.GraftSession.create()
      try {
        val report = graft.sources.Layout
          .compactPartitions(spark, path, maxFiles).collect()
        if (report.isEmpty) println(s"$path: healthy (no dir over $maxFiles files)")
        else report.foreach { r =>
          println(s"${r.getAs[String]("partition")}: " +
            s"${r.getAs[Int]("files_before")} files " +
            s"(${r.getAs[Long]("bytes_before")} B) -> " +
            s"${r.getAs[Int]("files_after")}")
        }
      } finally spark.stop()

    case other =>
      sys.error(s"usage: Cli (init [path] | ls [storeRoot] [limit] | serve [storeRoot] [port] | compact [storeRoot] | compact-layout <path> [maxFiles]); got: $other")
  }

  /** `[storeRoot] [n]` / `[n]` / `` with discovery fallback. A single
    * all-digit argument is a path if such a path EXISTS, else the numeric
    * limit/port — existence disambiguates, so an all-digit store directory
    * is still addressable.
    */
  private def rootAndArg(rest: List[String], default: Int): (String, Int) = {
    val (explicit, n) = rest match {
      case p :: v :: _ => (Some(p), v.toInt)
      case p :: Nil if p.forall(_.isDigit) && !new File(p).exists() => (None, p.toInt)
      case p :: Nil => (Some(p), default)
      case Nil => (None, default)
    }
    val root = discoverStore(explicit).getOrElse(
      sys.error(s"no $StoreRel found here or in 10 ancestors; run `Cli init` first"))
    (root, n)
  }

  /** `waddle ls` (cli.py:41-75): recent runs with humanized duration and
    * truncated ids, fixed-width — formatting runs engine-side.
    */
  private def ls(spark: org.apache.spark.sql.SparkSession, root: String, limit: Int): Unit = {
    val store = new WaddleStore(spark, root)
    val now = System.currentTimeMillis() / 1000.0

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
  }
}
