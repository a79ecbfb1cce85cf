package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Non-parquet ingestion paths (SURVEY.md §2.1 S-family extension).
  *
  * The reference ingests only via its Python API into DuckDB; a Spark
  * engine additionally ingests whatever lands in object storage. Explicit
  * schemas everywhere: schema inference re-reads the whole input at 100 TB
  * and silently widens types — declared schemas make ingestion one pass
  * and deterministic.
  */
object Ingest {

  /** The events-table schema, declared once for every text format.
    *
    * Every data column is declared NULLABLE on purpose: PERMISSIVE
    * quarantine emits rows where all data columns are null and only
    * `_corrupt` is set, so a non-null declaration on the raw read would be
    * false metadata the optimizer is allowed to exploit (e.g. eliding
    * IsNotNull filters) on exactly the quarantined rows. The non-null
    * CONTRACT belongs to the cleaned output — [[cleanEvents]] enforces it
    * after the corrupt split.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** Required (non-null after cleaning) columns of [[eventSchema]]. */
  val requiredEventCols: Seq[String] =
    Seq("event_id", "ts", "user_id", "event_type", "value")

  /** Split a PERMISSIVE read into clean rows (corrupt column dropped, all
    * required columns enforced non-null) — the half that carries the
    * non-null contract the raw schema deliberately does not claim.
    */
  def cleanEvents(raw: DataFrame): DataFrame =
    raw.where(col("_corrupt").isNull &&
        requiredEventCols.map(col(_).isNotNull).reduce(_ && _))
      .drop("_corrupt")

  /** The quarantined complement of [[cleanEvents]]. */
  def corruptEvents(raw: DataFrame): DataFrame = {
    val bad: Column = col("_corrupt").isNotNull ||
      requiredEventCols.map(col(_).isNull).reduce(_ || _)
    raw.where(bad)
  }

  /** CSV batch ingestion. PERMISSIVE mode + corrupt-record column: at
    * corpus scale a bad row must quarantine, not kill the job (ANSI strict
    * parsing is the wrong default for ingestion).
    */
  def eventsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema.add("_corrupt", StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** JSON-lines batch ingestion (one event object per line). */
  def eventsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Streaming file-source ingestion: new JSONL files appearing under
    * `path` become micro-batches (the streaming twin of the batch reader —
    * the landing-zone pattern: writers drop files, the engine tails the
    * directory). `maxFilesPerTrigger` bounds batch size so one bulk drop
    * cannot produce an unbounded micro-batch.
    */
  def eventsStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 16)
      .json(path)

  /** ORC interchange: the other columnar format Spark reads natively —
    * what a Hive-era warehouse hands over. Binary formats carry their own
    * schema and types, so there is no corrupt-record channel; the declared
    * schema still applies (projection by name, type check at plan time)
    * and [[cleanEvents]]'s non-null contract is enforced by the same
    * filter (minus the `_corrupt` probe, which is text-format-only).
    */
  def eventsFromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema).orc(path)
      .where(requiredEventCols.map(col(_).isNotNull).reduce(_ && _))

  /** Write events out as ORC (the interchange sink twin). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
