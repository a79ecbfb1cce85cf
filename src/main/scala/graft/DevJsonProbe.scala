package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev tool: decompose q_json_extract's wall (r16 verdict item #4) —
  * scan floor vs JSON parse vs output sort vs parse strategy
  * (get_json_object vs from_json). Warm min-of-3 per variant.
  * Usage: runMain graft.DevJsonProbe [sfDir]
  */
object DevJsonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    def ev = Tables.spread(Tables.events(spark, sfDir))

    def variant(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach(_ => df.count())
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[jsonprobe] $name%-28s min ${walls.min}%6.3f  laps ${walls.map(w => f"$w%5.3f").mkString(" ")}")
    }

    variant("scan_only_props")(ev.select("event_id", "user_id", "props"))
    variant("parse_only")(ev
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .select("event_id", "user_id", "k"))
    variant("parse_filter_nosort")(ev
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .where(col("k") > 50)
      .select("event_id", "user_id", "k"))
    variant("parse_filter_sort(current)")(ev
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .where(col("k") > 50)
      .select("event_id", "user_id", "k")
      .orderBy("event_id"))
    variant("fromjson_filter_nosort")(ev
      .withColumn("k", expr("try_cast(from_json(props, 'k string').k AS int)"))
      .where(col("k") > 50)
      .select("event_id", "user_id", "k"))
    variant("fromjson_filter_sort")(ev
      .withColumn("k", expr("try_cast(from_json(props, 'k string').k AS int)"))
      .where(col("k") > 50)
      .select("event_id", "user_id", "k")
      .orderBy("event_id"))
    variant("fenced_filter_sort(new)")(ev
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .where(expr("opt_fence(k > 50)"))
      .select("event_id", "user_id", "k")
      .orderBy("event_id"))
    variant("q_json_extract(registry)")(
      SparkEntry.queries("q_json_extract")(spark, sfDir))
    spark.stop()
  }
}
