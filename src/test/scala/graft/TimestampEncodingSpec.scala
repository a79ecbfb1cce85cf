package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The driver has regenerated `events.parquet` with THREE different `ts`
  * encodings across rounds (TIMESTAMP(NANOS) → read as Long under
  * `nanosAsLong`; TIMESTAMP_MICROS isAdjustedToUTC=0 → TimestampNTZ;
  * TIMESTAMP_MICROS UTC → TimestampType). Each change silently broke a
  * timestamp-consuming operator. This spec writes the same rows in all
  * three encodings and asserts [[graft.sources.Tables.events]] normalizes
  * every one to identical session-zoned TimestampType rows — so the next
  * regeneration cannot break the engine again.
  */
class TimestampEncodingSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("LTZ, NTZ, and nanos-Long events all normalize to the same rows") {
    val base = graft.sources.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .limit(500)

    // Encoding 1: UTC-adjusted TIMESTAMP_MICROS (plain LTZ write)
    val ltzDir = tmp("graft_ts_ltz")
    base.write.mode("overwrite").parquet(s"$ltzDir/events.parquet")

    // Encoding 2: TIMESTAMP_MICROS isAdjustedToUTC=0 — write the column as
    // TIMESTAMP_NTZ; with the session TZ pinned UTC the wall-clock fields
    // are identical to the LTZ instants
    val ntzDir = tmp("graft_ts_ntz")
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // Encoding 3: the nanosAsLong shape — Spark reads TIMESTAMP(NANOS)
    // parquet as a raw Long column, which Tables.events floor-divides back
    // to micros; emulate it by writing the Long nanos directly
    val nanosDir = tmp("graft_ts_nanos")
    base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    val expected = base.orderBy("event_id").collect()
    Seq("LTZ" -> ltzDir, "NTZ" -> ntzDir, "nanos-Long" -> nanosDir)
      .foreach { case (label, dir) =>
        val got = graft.sources.Tables.events(spark, dir)
        assert(got.schema("ts").dataType.typeName == "timestamp",
          s"$label: ts not normalized to TimestampType")
        val rows = got.orderBy("event_id").collect()
        assert(rows.length == expected.length, s"$label: row count")
        rows.zip(expected).foreach { case (g, e) =>
          assert(g == e, s"$label: row mismatch\n got $g\n exp $e")
        }
      }
  }

  test("catalog normalizes NTZ on EVERY table, not just events") {
    // orders/lineitem currently ship isAdjustedToUTC=0 too — they only
    // work because no operator applies unix-time functions to them yet;
    // the catalog must hand every consumer session-zoned TimestampType
    Seq(
      graft.sources.Tables.orders(spark, sf).schema("o_orderdate"),
      graft.sources.Tables.lineitem(spark, sf).schema("l_shipdate"),
      graft.sources.Tables.events(spark, sf).schema("ts")
    ).foreach { f =>
      assert(f.dataType.typeName == "timestamp",
        s"${f.name}: ${f.dataType.typeName} leaked through the catalog")
    }
  }
}
