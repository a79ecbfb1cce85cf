package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.sources.Tables

/** Invariants for the analytic composites (oracle hash gate covers value
  * equality; these pin semantics the hashes can't express).
  */
class AnalyticsSpec extends SparkSpec {

  test("setOps cohorts partition the click∪purchase user universe") {
    val rows = Analytics.setOps(spark, sf).collect()
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_users")).toMap
    assert(rows.keySet == Set("both", "click_only", "purchase_only"))
    val ev = Tables.events(spark, sf)
    val clickers = ev.where(col("event_type") === "click")
      .select("user_id").distinct().count()
    val buyers = ev.where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    // inclusion-exclusion: |C| = both + click_only, |P| = both + purchase_only
    assert(rows("both") + rows("click_only") == clickers)
    assert(rows("both") + rows("purchase_only") == buyers)
  }

  test("metricSummary covers exactly the top-20 recent users") {
    val df = Analytics.metricSummary(spark, sf)
    val users = df.select("user_id").distinct().count()
    assert(users <= 20)
    // every summarized series has its true latest value
    val ev = Tables.events(spark, sf)
    val expect = ev.groupBy("user_id", "event_type")
      .agg(max_by(col("value"), col("event_id")).as("v"))
    val joined = df.join(expect, Seq("user_id", "event_type"))
      .where(col("last_value") =!= col("v"))
    assert(joined.count() == 0)
  }

  test("metricSummary rebuilds its cached recency card after a corpus mutation") {
    // the recurring bug class (r13/r14): a fingerprint-keyed cache that
    // detects a corpus mutation must drop the catalog's pinned listing
    // before recomputing — the new recent_entities_20 artifact carries
    // that discipline. Append strictly-more-recent events under new user
    // ids and assert the card re-derives from the post-mutation corpus.
    val tmp = java.nio.file.Files.createTempDirectory("graft_recent_mut").toString
    val ev = Tables.events(spark, sf)
    ev.write.parquet(s"$tmp/events.parquet")
    try {
      val before = Analytics.metricSummary(spark, tmp)
        .select("user_id").distinct().collect().map(_.getLong(0)).toSet
      assert(before.forall(_ < 1000000L))
      // append: the same rows shifted to NEW users a year later — they
      // must own the entire post-mutation top-20 recency card
      ev.withColumn("user_id", col("user_id") + lit(1000000L))
        .withColumn("event_id", col("event_id") + lit(1000000L))
        .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
        .write.mode("append").parquet(s"$tmp/events.parquet")
      val after = Analytics.metricSummary(spark, tmp)
        .select("user_id").distinct().collect().map(_.getLong(0)).toSet
      // every shifted user is a year more recent than any original, so all
      // of them must be in the post-mutation card (the fixture has fewer
      // than 20 users, so originals legitimately fill the remaining slots)
      val shifted = before.map(_ + 1000000L)
      assert(shifted.subsetOf(after),
        s"post-append card must include every appended recent user: " +
          s"missing ${shifted -- after}, got $after")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("lagDelta: first row of each series has null delta, rest are value diffs") {
    val df = Analytics.lagDelta(spark, sf)
    val perSeries = df.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        count(col("delta")).as("n_delta"))
    // exactly one null delta (the series head) per series
    assert(perSeries.where(col("n") - col("n_delta") =!= 1).count() == 0)
  }

  test("rangeJoin counts only clicks inside the (ts, ts+1h] window") {
    val df = Analytics.rangeJoin(spark, sf)
    val signups = Tables.events(spark, sf)
      .where(col("event_type") === "signup").count()
    assert(df.count() == signups)
    // recompute one nonzero row by brute force
    val hit = df.where(col("n_clicks_1h") > 0).orderBy("event_id").head()
    val ev = Tables.events(spark, sf)
    val s = ev.where(col("event_id") === hit.getAs[Long]("event_id")).head()
    val sTs = s.getAs[java.sql.Timestamp]("ts")
    val manual = ev.where(
      col("event_type") === "click" &&
        col("user_id") === hit.getAs[Long]("user_id") &&
        col("ts") > lit(sTs) &&
        col("ts") <= lit(new java.sql.Timestamp(sTs.getTime + 3600 * 1000L)))
      .count()
    assert(manual == hit.getAs[Long]("n_clicks_1h"))
  }

  test("cubeOrders contains all four grouping levels and a consistent total") {
    val rows = Analytics.cubeOrders(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = Tables.orders(spark, sf).count()
    assert(grand.head.getAs[Long]("n_orders") == total)
    // per-status marginal rows exist (status set, priority null)
    assert(rows.exists(r => !r.isNullAt(0) && r.isNullAt(1)))
    // per-priority marginal rows exist (status null, priority set)
    assert(rows.exists(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("windowAnalytics: pr in [0,1], quartiles 1..4, monotone with value") {
    val df = Analytics.windowAnalytics(spark, sf)
    assert(df.where(col("pr") < 0 || col("pr") > 1).count() == 0)
    assert(df.where(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    // within a series key, higher value never gets a lower quartile
    val w = df.select("event_type", "value", "quartile").collect()
      .groupBy(_.getString(0))
    for ((_, rows) <- w) {
      val sorted = rows.sortBy(_.getDouble(1))
      val qs = sorted.map(_.getLong(2))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    }
  }
}
