package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** r22 interleaved same-JVM A/Bs for the r21-verdict asks (#2, #3): each
  * lap runs EVERY variant back-to-back, so a host-steal burst poisons all
  * variants of a lap equally and the per-variant min is window-immune —
  * the repo's standard protocol (r21's set_ops discipline).
  *
  * Families:
  *   antijoin — q_antijoin_absent (a) current declarative anti-join,
  *     (b) build-side pre-distinct of lineitem keys, (c) keys-only
  *     decide-then-attach (absent keys anti-join, semi-join back).
  *   upsert — q_upsert_latest (a) row_number window, (b) max_by(struct)
  *     hash aggregate (equivalent because event_id is globally unique —
  *     checked at all three SFs).
  *   wrank — q_window_rank (a) row_number window w/ WindowGroupLimit,
  *     (b) sort_array(collect_list)[1..3] aggregate + posexplode.
  *
  * Usage: runMain graft.DevR22AB [sfDir] [family ...] [laps=N]
  */
object DevR22AB {

  // ---- antijoin variants ----
  private def antijoinCurrent(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.antijoinAbsent(spark, dir)

  private def antijoinPredistinct(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select("l_orderkey").distinct()
    ords.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private def antijoinKeysAttach(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    val absent = ords.select("o_orderkey")
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
    ords.join(absent, Seq("o_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // ---- upsert_latest variants ----
  private def upsertWindow(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Tracking.upsertLatest(spark, dir)

  private def upsertMaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(max_by(struct(col("ts"), col("value"), col("props")), col("event_id")).as("r"))
      .select(col("user_id"), col("event_type"),
        col("r.ts").as("ts"), col("r.value").as("value"), col("r.props").as("props"))
      .orderBy("user_id", "event_type")

  // ---- window_rank variants ----
  private def wrankWindow(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Tracking.windowRank(spark, dir)

  private def wrankCollect(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(slice(reverse(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type"))))), 1, 3).as("top"))
      .select(col("user_id"), posexplode(col("top")))
      .select(col("user_id"), (col("pos") + 1).as("rn"),
        col("col.event_id").as("event_id"), col("col.event_type").as("event_type"))
      .orderBy("user_id", "rn")

  private val families: Map[String, Seq[(String, (SparkSession, String) => DataFrame)]] = Map(
    "antijoin" -> Seq(
      "current" -> (antijoinCurrent _),
      "predistinct" -> (antijoinPredistinct _),
      "keysattach" -> (antijoinKeysAttach _)),
    "upsert" -> Seq(
      "window" -> (upsertWindow _),
      "maxby" -> (upsertMaxBy _)),
    "wrank" -> Seq(
      "window" -> (wrankWindow _),
      "collect" -> (wrankCollect _)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val laps = args.collectFirst { case s if s.startsWith("laps=") => s.drop(5).toInt }
      .getOrElse(7)
    val want = args.filter(families.contains).toSeq match {
      case Nil => families.keys.toSeq.sorted
      case xs => xs
    }
    val spark = GraftSession.create()
    want.foreach { fam =>
      val vs = families(fam)
      // answer-equality first: every variant must produce the SAME rows as
      // the current form before any timing is worth reading
      val ref = vs.head._2(spark, sfDir).collect().map(_.toString).sorted
      vs.tail.foreach { case (vn, fn) =>
        val got = fn(spark, sfDir).collect().map(_.toString).sorted
        val eq = ref.sameElements(got)
        println(s"[ab] $fam/$vn rows_equal=$eq (${got.length} rows vs ${ref.length})")
        assert(eq, s"$fam/$vn DIVERGES — timing aborted")
      }
      // warm every variant once
      vs.foreach { case (_, fn) => fn(spark, sfDir).count() }
      val times = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      (1 to laps).foreach { _ =>
        vs.foreach { case (vn, fn) =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          times(vn) = times(vn) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      vs.foreach { case (vn, _) =>
        val ts = times(vn).sorted
        val med = ts(ts.size / 2)
        println(f"[ab] $fam%-9s $vn%-12s min ${ts.head}%6.3f  med $med%6.3f  " +
          ts.map(t => f"$t%5.3f").mkString("[", " ", "]"))
      }
    }
    spark.stop()
  }
}
