package graft

import org.apache.spark.sql.functions._

/** r22 verdict-item-6: the r21 single-scan rewrites (set_ops, full_outer,
  * asof_align) shipped with sf0.1 plan evidence only; this tool re-measures
  * their shuffle volumes on an events-shaped DECADE corpus — 10× sf0.1
  * (1M rows), same entities with 10× the history (event_ids offset to stay
  * unique, ts shifted by one day per replica) — and prints ShuffleAudit
  * rows at both scales so SCALING.md can record whether the claimed
  * card-sized partials (flags-only / two-DECIMAL) hold while input grows
  * 10×. q_upsert_latest (r22 max_by rewrite) rides along.
  *
  * Usage: runMain graft.DevR22EventsDecade [decadeDir]
  */
object DevR22EventsDecade {
  private val Queries =
    Seq("q_set_ops", "q_full_outer", "q_asof_align", "q_upsert_latest")

  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val decade = args.headOption.getOrElse("/tmp/graft_events_decade")
    val spark = GraftSession.create()
    val evOut = new java.io.File(s"$decade/events.parquet")
    if (!evOut.exists()) {
      val ev = graft.sources.Tables.events(spark, base)
      val ten = (0 until 10).map { i =>
        ev.select(
          (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
          col("user_id"), col("event_type"),
          (col("ts") + expr(s"INTERVAL $i DAYS")).as("ts"),
          col("value"), col("props"))
      }.reduce(_.unionByName(_))
      ten.write.mode("overwrite").parquet(evOut.toString)
      println(s"[decade] wrote ${spark.read.parquet(evOut.toString).count()} rows to $evOut")
    }
    Seq("sf0.1" -> base, "decade10x" -> decade).foreach { case (label, dir) =>
      val audits = ShuffleAudit.measure(spark, dir, Queries)
      Queries.foreach { q =>
        audits.get(q).foreach { a =>
          println(f"[decade] $label%-9s $q%-16s input_records ${a.inputRecords}%9d  shuffle_bytes ${a.shuffleBytes}%10d  shuffle_records ${a.shuffleRecords}%9d")
        }
      }
    }
    spark.stop()
  }
}
