package graft

import org.apache.hadoop.fs.Path

/** One-off: what does Hadoop LocalFileSystem.rename(src, dst) do when dst
  * EXISTS as a directory? The PassageStore/AnnIndex commit protocol assumes
  * it FAILS (loser adopts the winner); POSIX-style "move src INTO dst"
  * semantics would instead nest the loser's staging inside the winner's
  * delta and silently drop its rows from the union read.
  */
object DevR22RenameProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = java.nio.file.Files.createTempDirectory("renameprobe").toString
    fs.mkdirs(new Path(s"$base/staging"))
    fs.create(new Path(s"$base/staging/data.txt"), true).close()
    fs.mkdirs(new Path(s"$base/delta_000"))
    fs.create(new Path(s"$base/delta_000/winner.txt"), true).close()
    val r = fs.rename(new Path(s"$base/staging"), new Path(s"$base/delta_000"))
    println(s"[probe] rename into existing dir returned: $r")
    def walk(f: java.io.File, indent: String): Unit = {
      println(s"[probe] $indent${f.getName}")
      val kids = f.listFiles(); if (kids != null) kids.foreach(walk(_, indent + "  "))
    }
    walk(new java.io.File(base), "")
    spark.stop()
  }
}
