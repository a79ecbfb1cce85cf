package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** The events-table schema, declared once for every text format. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

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
}
