package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.model.{CollectionOps, CollectionSpec, Documents}

/** Structured Streaming surface. The reference is batch-with-
  * continuation (SURVEY §2.10) — its webhook-style increments
  * (post-initialization seeding into the upsert path, seeding.py:
  * 156-166) map to `readStream → foreachBatch(upsert)`; true streaming
  * analytics (watermarked event-time windows) is an ADDITION beyond the
  * reference surface for the 100 TB pipeline case.
  */
object Streaming {

  /** Incremental document ingestion: each micro-batch of property JSON
    * upserts into the versioned collection store through the SAME merge
    * semantics as batch seeding (one code path, two execution modes).
    * `load` must return the current snapshot; `save` persists the merged
    * snapshot (e.g. VersionStore write + manifest bump).
    */
  def upsertSink(spec: CollectionSpec,
                 load: SparkSession => DataFrame,
                 save: DataFrame => Unit)(stream: DataFrame): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val current = load(spark)
        val updates = Documents.fromProperties(batch)
        val merged = CollectionOps.upsert(current, updates,
          spec.identifier.getOrElse("id"), spec)
        save(merged.localCheckpoint(true))
      }

  /** Watermarked event-time windowed aggregation over an events stream —
    * the streaming twin of q12_time_window. Late data beyond the
    * watermark is dropped; state is bounded (mandatory at 100 TB). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Sessionized per-key state via flatMapGroupsWithState-style
    * aggregation: running per-entity counters maintained across
    * micro-batches (the custom-state extension point). Batch-testable
    * form: the same transformation works on a static frame. */
  def runningTotals(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        max(col("ts")).as("last_seen"))

  /** Streaming exact deduplication for document ingestion: documents
    * whose normalized-text hash was already seen are dropped,
    * `dropDuplicatesWithinWatermark` keeps the dedup state BOUNDED (an
    * unbounded `dropDuplicates` key set is a slow OOM at 100 TB —
    * within-watermark state is the only shape that survives an infinite
    * stream; exact global dedup belongs in the batch compaction pass,
    * Dedup.exactGroups). `tsCol` is the event-time column the watermark
    * rides on. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
}
