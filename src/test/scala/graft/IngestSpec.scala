package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Tables}

/** Round-trips the events table through each text format and checks the
  * corrupt-row quarantine path.
  */
class IngestSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and schema") {
    val out = tmpDir("graft_csv")
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").option("header", "true").csv(out)
    val back = Ingest.eventsFromCsv(spark, out).drop("_corrupt")
    assert(back.count() == ev.count())
    val sumBack = back.agg(sum("value")).head().getDouble(0)
    val sumOrig = ev.agg(sum("value")).head().getDouble(0)
    assert(math.abs(sumBack - sumOrig) <= 1e-6)
    assert(back.schema("ts").dataType.typeName == "timestamp")
  }

  test("JSONL round-trip preserves rows") {
    val out = tmpDir("graft_jsonl")
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").json(out)
    val back = Ingest.eventsFromJsonl(spark, out).drop("_corrupt")
    assert(back.count() == ev.count())
  }

  test("gzip'd JSONL ingests transparently (landing zones compress)") {
    val out = tmpDir("graft_jsonl_gz")
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").option("compression", "gzip").json(out)
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".gz")))
    val back = Ingest.eventsFromJsonl(spark, out).drop("_corrupt")
    assert(back.count() == ev.count())
  }

  test("ORC round-trip preserves rows, values, and timestamp type") {
    val out = tmpDir("graft_orc")
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    Ingest.writeOrc(ev, out)
    val back = Ingest.eventsFromOrc(spark, out)
    assert(back.count() == ev.count())
    val sumBack = back.agg(sum("value")).head().getDouble(0)
    val sumOrig = ev.agg(sum("value")).head().getDouble(0)
    assert(math.abs(sumBack - sumOrig) <= 1e-6)
    assert(back.schema("ts").dataType.typeName == "timestamp")
  }

  test("corrupt JSONL rows quarantine instead of failing the read") {
    val out = tmpDir("graft_bad")
    Files.writeString(java.nio.file.Path.of(out, "part-0.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":7,"event_type":"click","value":1.5,"props":null}
        |this is not json
        |""".stripMargin)
    // cache first: Spark refuses corrupt-column-only queries over raw files
    val back = Ingest.eventsFromJsonl(spark, out).cache()
    try {
      assert(back.where(col("_corrupt").isNotNull).count() == 1)
      assert(back.where(col("_corrupt").isNull).count() == 1)
    } finally back.unpersist()
  }

  test("raw schema is nullable; cleanEvents carries the non-null contract") {
    // the raw read must not claim non-nullability PERMISSIVE can't deliver
    assert(Ingest.eventSchema.fields.forall(_.nullable))

    val out = tmpDir("graft_split")
    Files.writeString(java.nio.file.Path.of(out, "part-0.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":7,"event_type":"click","value":1.5,"props":null}
        |not json at all
        |{"event_id":null,"ts":"2024-01-01T00:00:01","user_id":8,"event_type":"view","value":2.0,"props":null}
        |""".stripMargin)
    val raw = Ingest.eventsFromJsonl(spark, out).cache()
    try {
      val clean = Ingest.cleanEvents(raw)
      assert(clean.count() == 1, "only the fully-populated row is clean")
      assert(!clean.columns.contains("_corrupt"))
      assert(Ingest.requiredEventCols.forall(c =>
        clean.where(col(c).isNull).count() == 0))
      // quarantine = the parse failure AND the null-required-field row
      assert(Ingest.corruptEvents(raw).count() == 2)
    } finally raw.unpersist()
  }

  test("streaming file source ingests a dropped file as a micro-batch") {
    val in = tmpDir("graft_stream_in")
    val ev = Tables.events(spark, sf).limit(50)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").json(in)
    val q = Ingest.eventsStream(spark, in)
      .writeStream.format("memory").queryName("ingest_stream_test")
      .option("checkpointLocation", tmpDir("graft_stream_ck"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("ingest_stream_test").count() == 50)
    } finally q.stop()
  }
}
