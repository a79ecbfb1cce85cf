package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal alignment operators (SURVEY.md §2.3 — "as-of is the nearest
  * miss": the reference overlays metric series client-side by step,
  * /root/reference/waddle/static/index.html:405-413; §2.9 notes no
  * session semantics exist at all).
  *
  * Both are expressed with the union+window idiom — preference order (a),
  * "compose existing ops", from the custom-operator ladder: no custom
  * strategy is needed because a sorted window over the unioned stream IS
  * the as-of merge.
  */
object Temporal {

  /** As-of alignment: each 'click' event joined to the latest 'view' event
    * of the same user at-or-before its timestamp.
    *
    * Implementation: tag both streams, union, and take `last(value of B,
    * ignoreNulls)` over a per-user window ordered by (ts, tag, event_id)
    * with B-rows sorting first at equal ts (inclusive as-of). One shuffle
    * on user_id, one per-group sort — the same cost profile as a
    * sort-merge as-of join, with no custom SparkPlan.
    * Scale: with events bucketed by user_id the shuffle disappears; the
    * window state is O(1) per row (running last), never a buffered group.
    */
  def asofAlign(spark: SparkSession, dir: String): DataFrame = {
    // One-scan tagged form (r21 optimization; guide §2.4): the two-branch
    // self-union planned TWO scans of the fact table — but the tag is just
    // `event_type = 'view'`, so one scan with an In-pushed filter produces
    // the identical tagged row set (union order is irrelevant: the window
    // re-sorts per user, and the final orderBy is a total order). At
    // 100 TB this halves the fact reads of every as-of alignment.
    val tagged = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        (col("event_type") === "view").as("is_view"),
        col("value").as("view_value"))

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), desc("is_view"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("last_view_value",
        last(when(col("is_view"), col("view_value")), ignoreNulls = true).over(w))
      .where(!col("is_view"))
      .select("event_id", "user_id", "ts", "value", "last_view_value")
      .orderBy("event_id")
  }

  /** Sessionization: split each user's event stream into sessions separated
    * by >30-minute gaps; emit per-session stats.
    *
    * lag + gap flag + running sum = session index — one window pass, then a
    * hash aggregate.
    * Scale: one shuffle on user_id; the window is a streaming scan per
    * group (lag/cumsum need no buffering). The streaming twin is
    * [[graft.streaming.Streams.sessionWindows]] (`session_window`), with
    * a StreamingSpec pin that replayed events converge to this card.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_idx")
  }
}
