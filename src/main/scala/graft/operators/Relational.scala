package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operators (SURVEY.md §2.2, §2.3 J1/J2, §2.4, §2.6).
  *
  * Every query ends in a total order over a unique key so the driver's
  * DuckDB hash-compare is deterministic (SURVEY.md §5.4) — a global
  * `orderBy` where the output grows with the corpus (the range sort is
  * the scale-correct plan there), [[Present.cardSort]] where the output
  * is bounded by key cardinality or top-k geometry. Money
  * aggregates go through DECIMAL so the sum is exact and order-insensitive,
  * then cast to DOUBLE at the end (SURVEY.md §7.5 determinism discipline).
  *
  * Scale notes are per-operator; the common theme: filters and projections
  * stay attached to the Parquet scan (pushdown + pruning), aggregations are
  * hash aggregates with map-side partials, and every dimension join is
  * broadcast so the fact table never shuffles for a join.
  */
object Relational {

  /** P1 — dynamic AND-combined equality predicates + projection.
    * Reference: `list_runs` WHERE assembly, /root/reference/waddle/_dashboard_api.py:33-43.
    * Scale: both predicates push into the Parquet scan (`PushedFilters`);
    * only 4 of 6 columns are read (`ReadSchema`). No shuffle except the
    * output sort, which at scale would be a range partition over o_orderkey.
    */
  def filterEq(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")

  /** P2 — point lookup by primary key.
    * Reference: run-by-id, /root/reference/waddle/_dashboard_api.py:77-80.
    * Scale: the equality predicate pushes to Parquet row-group stats — with
    * data sorted/bucketed by key this touches one row group, the Spark analog
    * of the reference's PK index probe.
    */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderkey") === 42L)
      .orderBy("o_orderkey")

  /** P3 — prefix predicate splitting a key namespace.
    * Reference: `key NOT LIKE 'system/%'`, /root/reference/waddle/_dashboard_api.py:212.
    * Scale: NOT LIKE 'prefix%' is a StringStartsWith negation — pushed to the
    * scan. Output sort on unique event_id.
    */
  def prefixLike(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(!col("event_type").startsWith("s"))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** P4 — substring search over concatenated display fields.
    * Reference: client-side search, /root/reference/waddle/static/index.html:185-191.
    * Scale: evaluated in whole-stage codegen directly over the scan; no
    * shuffle before the output sort.
    */
  def searchContains(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .where(lower(concat_ws(" ", col("c_name"), col("c_mktsegment"))).contains("building"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** P5 — IN-list over the series fact table.
    * Reference: `WHERE run_id IN (…)`, /root/reference/waddle/_dashboard_api.py:160-196.
    * Scale: a literal IN-list compiles to an `In` filter pushed to Parquet.
    * For thousands of ids the same operator becomes a broadcast semi-join
    * (ids DataFrame → `join(..., "left_semi")`), never a driver-side loop.
    */
  def inlistSeries(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("user_id").isin(1L, 2L, 3L, 5L, 8L, 13L))
      .select("event_id", "user_id", "event_type", "ts", "value")
      .orderBy("user_id", "ts", "event_id")

  /** O1 — whitelist-sorted page: ORDER BY … LIMIT n OFFSET m.
    * Reference: /root/reference/waddle/_dashboard_api.py:45-51 (limit 200 default :28).
    * Scale: sort+limit compiles to TakeOrderedAndProject — each task keeps a
    * 220-row heap, the driver merges 1 heap per partition; no global sort of
    * the table. The o_orderkey tiebreak makes pagination deterministic.
    */
  def listSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_orderdate"), asc("o_orderkey"))
      .offset(20)
      .limit(200)

  /** O2 — one series fetch: point filter + order + cap.
    * Reference: /root/reference/waddle/_dashboard_api.py:140-149 (LIMIT 5000).
    * Scale: both equality predicates push down; with `metrics` bucketed by
    * run_id the scan touches one bucket. TakeOrderedAndProject caps memory.
    */
  def seriesFetch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("user_id") === 7L && col("event_type") === "click")
      .select("event_id", "ts", "value")
      .orderBy("ts", "event_id")
      .limit(5000)

  /** A2 — distinct key namespace, excluding a prefix.
    * Reference: /root/reference/waddle/_dashboard_api.py:208-216.
    * Scale: distinct = partial hash-dedup per partition then a 5-row shuffle;
    * the expensive part never leaves the mappers.
    */
  def distinctKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(!col("event_type").startsWith("s"))
      .select("event_type")
      .distinct()
      .transform(Present.cardSort(_, col("event_type")))

  /** A3 — argmax-per-group: the value at the greatest sequence point.
    * Reference: correlated scalar subquery `step = (SELECT MAX(step) …)`,
    * /root/reference/waddle/_dashboard_api.py:218-235. Spark-first form is
    * `max_by`, a single hash aggregate — no decorrelation, no self-join, no
    * window sort.
    * Scale: one shuffle on the group key with map-side partial max_by;
    * contrast with the window-function form (Tracking.windowRank) which must
    * sort every group.
    */
  def lastPerGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(
        max("event_id").as("last_event_id"),
        max_by(col("value"), col("event_id")).as("last_value"))
      .orderBy("user_id", "event_type")

  /** A5 — best-result-per-entity: each customer's cheapest order
    * (argmin). Reference: min-over-runs best result selection,
    * /root/reference/examples/hyperparameter_sweep.py:68, done client-side
    * there; engine-side it is `min_by` in one hash aggregate.
    * Scale: identical shape to [[lastPerGroup]] — one shuffle, map-side
    * partial argmin.
    */
  def bestPerEntity(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        // (o_custkey, o_totalprice) has no ties in the testdata at any SF,
        // so the scalar ordering key is deterministic (DuckDB 1.0 min_by
        // lacks struct ordering keys for a composite tiebreak)
        min_by(col("o_orderkey"), col("o_totalprice")).as("best_orderkey"),
        min("o_totalprice").as("best_price"))
      .orderBy("o_custkey")

  /** J1 — fact ⋈ dimensions + hash aggregate (revenue per market segment).
    * Reference shape: `metrics JOIN runs`, /root/reference/waddle/_dashboard_api.py:222-231,
    * lifted onto the star schema (SURVEY.md §7.2).
    * Money math in DECIMAL(18,2)→exact sum→DOUBLE, so the result is identical
    * under any partitioning/summation order.
    * Scale: REGIME-ADAPTIVE, no forced hints. Orders and customer grow with
    * the corpus, so an unconditional `broadcast()` on either is a hard job
    * failure past the 8 GB broadcast limit at ~100× scale. Instead the join
    * is left declarative: below `autoBroadcastJoinThreshold` the planner
    * (and AQE, post-filter) picks a broadcast hash join — zero fact shuffle,
    * pinned in PlanSpec at bench scale — and past it the SAME plan degrades
    * to a keyed sort-merge/shuffled-hash join whose exchanges carry only the
    * pruned (key, segment) / (key, rev) columns, with the o_orderstatus
    * filter still pushed below the join (over-threshold regime also pinned
    * in PlanSpec, mirroring q_antijoin_absent's discipline).
    */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ords = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
    li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum("rev").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .transform(Present.cardSort(_, col("c_mktsegment")))
  }

  /** §2.4 note — multi-level aggregate via ROLLUP: revenue at (segment,
    * status), per segment, and grand total in ONE pass. The reference has
    * no grouping sets; Spark's built-in covers it (SURVEY.md §2.4 "not
    * present" row) — included because a dashboard summary at 100 TB should
    * be one scan, not three.
    * Scale: rollup compiles to a single Expand + hash aggregate — the fact
    * table is read once; DECIMAL money math keeps every level exact.
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    // SQL form: the DataFrame rollup re-mints grouping attributes, which
    // makes a post-rollup ORDER BY on those columns resolve ambiguously
    // (Spark's self-join ambiguity check trips); the SQL path resolves
    // cleanly and plans identically. customer auto-broadcasts (< threshold).
    // Final order via cardSort (asc = NULLS FIRST, same as the SQL form
    // it replaces): the rollup answer is segments × statuses rows.
    Present.cardSort(
      spark.sql(
        s"""SELECT c_mktsegment, o_orderstatus,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |       count(*) AS n_orders
           |FROM ${Tables.sqlRef(spark, dir, "orders")} JOIN ${Tables.sqlRef(spark, dir, "customer")}
           |  ON o_custkey = c_custkey
           |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
           |""".stripMargin),
      col("c_mktsegment"), col("o_orderstatus"))

  /** J2 — anti-join: rows in the parent with no child (insert-if-absent probe).
    * Reference: commit existence probe, /root/reference/waddle/_db.py:111-134.
    * Scale: left_anti join; AQE converts to broadcast when the probe side is
    * small. With both sides bucketed on the key it is a zero-shuffle
    * sort-merge anti-join.
    */
  def antijoinAbsent(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    ords.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }
}
