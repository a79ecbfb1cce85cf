package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB physical layout, as a write path (SCALING.md "Data layout").
  *
  * Reference analog: the reference's only layout decision is one DuckDB
  * file plus the `idx_metrics_run_key(run_id,key,step)` index
  * (/root/reference/waddle/_schema.py:59). At cluster scale the same access
  * patterns come from physical layout instead of an index:
  *
  *  - date partitions → partition pruning kills whole days before any I/O
  *    (the analog of a ts range scan);
  *  - bucketing by the entity key → per-run reads touch one bucket, and
  *    every run-keyed join/aggregate is ZERO-shuffle (proved in
  *    LayoutSpec/PlanSpec);
  *  - sort within buckets by (key, ts) → parquet row-group stats give the
  *    index's (run_id, key, step) probe order.
  *
  * Writes go through `saveAsTable` because bucketing metadata lives in the
  * catalog; plain parquet directories cannot carry it.
  */
object Layout {

  /** Write the events fact in production layout: partitioned by event date,
    * bucketed by user_id, sorted within each bucket by (event_type, ts).
    * Scale: the writer shuffles once (by bucket key) and writes
    * days × buckets files; appends land in new date partitions without
    * touching old ones.
    */
  def writeEvents(
      spark: SparkSession,
      dir: String,
      table: String = "events_layout",
      buckets: Int = 8): Unit =
    Tables.events(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
      // one shuffle to co-locate rows with their target bucket, so each
      // (date, bucket) pair is written by exactly one task instead of
      // every task appending a sliver to every bucket file
      .repartition(col("event_date"), col("user_id"))
      .write
      .partitionBy("event_date")
      .bucketBy(buckets, "user_id")
      .sortBy("event_type", "ts")
      .mode("overwrite")
      .saveAsTable(table)

  /** Per-entity series aggregate over the layed-out table — the shape that
    * must be zero-shuffle: grouping key == bucket key means every group is
    * wholly inside one bucket, so the aggregate has no exchange at all.
    */
  def perUserStats(spark: SparkSession, table: String = "events_layout"): DataFrame =
    spark.table(table)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("ts").as("last_ts"))

  /** Streaming sink into the production layout: each micro-batch appends
    * into the bucketed/partitioned table via foreachBatch (DataStreamWriter
    * cannot declare buckets itself; the batch writer inside can). New days
    * create new partitions; every batch keeps the bucket spec, so the
    * zero-shuffle properties hold over data that arrived live.
    *
    * Idempotence: foreachBatch alone is at-least-once — a batch retried
    * after a partial append would double rows. A batch-id LEDGER (tiny
    * parquet log next to the checkpoint) makes retries no-ops: a batch
    * already recorded is skipped. The residual window is a crash BETWEEN
    * the append and the ledger write (exactly-once needs a transactional
    * table format); the window is one metadata write wide and a retry
    * after it duplicates at most one batch — vs. every retry without it.
    * Scale: one small shuffle per micro-batch (bucket co-location), bounded
    * by trigger size; partitions touched = days present in the batch; the
    * ledger read is one tiny parquet scan per batch.
    */
  def streamIntoLayout(
      events: DataFrame,
      table: String,
      checkpointDir: String,
      buckets: Int = 8) =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchIdempotent(batch, batchId, table,
          s"$checkpointDir/graft_batch_ledger", buckets)
        ()
      }

  /** The foreachBatch body, exposed for direct testing: append `batch`
    * into the layout table unless `batchId` is already in the ledger.
    * Returns true when the batch was written, false when skipped as a
    * duplicate delivery.
    */
  def appendBatchIdempotent(
      batch: DataFrame,
      batchId: Long,
      table: String,
      ledger: String,
      buckets: Int = 8): Boolean = {
    val spark = batch.sparkSession
    import spark.implicits._
    // existence probe through the Hadoop FileSystem API: a java.io.File
    // check is local-FS only — on hdfs:///s3a:// (the 100 TB deployment)
    // it would always be false and idempotence would be silently disabled.
    // A crash mid-ledger-write can leave a dir with no readable footer, so
    // the probe also requires at least one complete parquet part file.
    val ledgerPath = new org.apache.hadoop.fs.Path(ledger)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledgerReadable = fs.exists(ledgerPath) &&
      fs.listStatus(ledgerPath).exists { st =>
        val n = st.getPath.getName
        n.startsWith("part-") && n.endsWith(".parquet")
      }
    val committed = ledgerReadable &&
      !spark.read.parquet(ledger).where(col("batch_id") === batchId).isEmpty
    if (!committed) {
      batch.withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"), col("user_id"))
        .write
        .partitionBy("event_date")
        .bucketBy(buckets, "user_id")
        .sortBy("event_type", "ts")
        .mode("append")
        .saveAsTable(table)
      Seq(batchId).toDF("batch_id").write.mode("append").parquet(ledger)
    }
    !committed
  }

  /** One day's slice — must prune to a single date partition at plan time. */
  def daySlice(
      spark: SparkSession,
      day: String,
      table: String = "events_layout"): DataFrame =
    spark.table(table).where(col("event_date") === lit(day))
}
