package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Tracking}
import graft.sources.Tables

/** Semantics pinned per operator, mirroring the reference's direct-SQL
  * asserts (SURVEY.md §5). The DuckDB hash gate covers value equality;
  * these cover invariants.
  */
class RelationalSpec extends SparkSpec {

  test("filterEq applies both predicates") {
    val rows = Relational.filterEq(spark, sf).collect()
    assert(rows.nonEmpty)
    val check = Tables.orders(spark, sf)
      .where(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .count()
    assert(rows.length == check)
  }

  test("pointLookup returns exactly the keyed row") {
    val rows = Relational.pointLookup(spark, sf).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("o_orderkey") == 42L)
  }

  test("lastPerGroup picks the value at the max event_id per group") {
    val df = Relational.lastPerGroup(spark, sf)
    assert(df.columns.toSet ==
      Set("user_id", "event_type", "last_event_id", "last_value"))
    // one row per (user_id, event_type) present in the data
    val groups = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(df.count() == groups)
    // spot-check one group against a direct sort
    val ev = Tables.events(spark, sf)
      .where(col("user_id") === 7L && col("event_type") === "click")
      .orderBy(desc("event_id")).select("event_id", "value").head()
    val got = df.where(col("user_id") === 7L && col("event_type") === "click").head()
    assert(got.getAs[Long]("last_event_id") == ev.getLong(0))
    assert(got.getAs[Double]("last_value") == ev.getDouble(1))
  }

  test("antijoinAbsent rows have no matching lineitem") {
    val absent = Relational.antijoinAbsent(spark, sf)
    val joined = absent.join(
      Tables.lineitem(spark, sf),
      col("o_orderkey") === col("l_orderkey"))
    assert(joined.count() == 0)
    assert(absent.count() > 0)
  }

  test("upsertLatest is idempotent and one row per key-pair") {
    val once = Tracking.upsertLatest(spark, sf)
    val keys = once.select("user_id", "event_type").distinct().count()
    assert(once.count() == keys)
  }

  test("deleteCascade leaves no victim rows") {
    val remaining = Tracking.deleteCascade(spark, sf)
    val victims = Tables.events(spark, sf)
      .where(col("event_type") === "error" && col("value") > 150.0)
      .select("user_id").distinct()
    assert(remaining.join(victims, Seq("user_id"), "left_semi").count() == 0)
  }

  test("staleDetect marks exactly the pre-cutoff groups aborted") {
    val df = Tracking.staleDetect(spark, sf)
    val wrong = df.where(
      (col("status") === "aborted" && col("last_ts") >= lit("2024-01-30 23:55:00").cast("timestamp")) ||
        (col("status") === "running" && col("last_ts") < lit("2024-01-30 23:55:00").cast("timestamp")))
    assert(wrong.count() == 0)
  }

  test("paramPivot has one wide row per user with the 5 type columns") {
    val df = Tracking.paramPivot(spark, sf)
    assert(df.columns.toSet ==
      Set("user_id", "click", "error", "purchase", "signup", "view"))
    assert(df.count() ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("saltedJoin matches a plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a tail, joined to a 3-row dimension
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      Seq((2L, 1L), (3L, 2L))).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "label")
    val plain = fact.join(dim, "k")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", col("payload"), 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("label").count().collect().sortBy(_.getString(0)).toSeq ==
      plain.groupBy("label").count().collect().sortBy(_.getString(0)).toSeq)
    // hot key really is spread over multiple salts
    val spread = fact.withColumn("s", pmod(xxhash64(col("payload")), lit(8)))
      .where(col("k") === 1L).select("s").distinct().count()
    assert(spread > 1)
  }

  test("windowRank emits at most 3 rows per user, ranks 1..3") {
    val df = Tracking.windowRank(spark, sf)
    val perUser = df.groupBy("user_id").agg(
      count(lit(1)).as("n"), max("rn").as("maxrn"))
    assert(perUser.where(col("n") > 3 || col("maxrn") > 3).count() == 0)
  }
}
