package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.storage.Storage

/** Structured-Streaming extensions beyond the reference's passthrough
  * file-stream surface (SURVEY.md §2.10): event-time tumbling windows
  * with watermarked late-data handling. Standard Spark streaming
  * machinery — state is bounded by the watermark, partitioned by the
  * group keys, and scales with shuffle partitions.
  */
object StreamingOps {

  /** Tumbling event-time window aggregation with a watermark.
    * Works on both batch and streaming frames (same code path — Spark
    * semantics guarantee the batch result is the stream's final state). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLength: String,
                     watermarkDelay: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    withWm
      .groupBy(window(col(tsCol), windowLength).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"),
        col("total_value"))
  }

  /** Sliding (hopping) event-time windows: every event lands in
    * size/slide overlapping windows, each epoch-aligned to the slide.
    * Same batch/stream dual-mode contract as [[tumblingCounts]];
    * state per (window, key) is bounded by the watermark. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLength: String, slide: String,
                    watermarkDelay: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    withWm
      .groupBy(window(col(tsCol), windowLength, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"),
        col("total_value"))
  }

  /** Streaming MERGE: CDC-style upserts into a managed table, one
    * [[Storage.merge]] per micro-batch via foreachBatch (the standard
    * Spark pattern for merge sinks — Delta's docs prescribe exactly
    * this shape for streaming upserts).
    *
    * Semantics: each micro-batch applies the merge condition against
    * the CURRENT table state, so later batches see earlier batches'
    * upserts.
    *
    * Delivery: with `txnAppId` set, applied batch ids are recorded in
    * the table's op log (Delta's txnAppId/txnVersion pattern) and a
    * replayed batch — after a checkpoint reset or restart race — is
    * SKIPPED instead of re-applied, so a stale batch can never
    * overwrite newer upserts. Without it, delivery is at-least-once
    * and safety relies on the merge being idempotent (key-based
    * conditions). The txn record lands after the merge's swap, so a
    * crash exactly between the two replays one batch — the same
    * at-least-once floor as any two-step commit without a
    * transactional log.
    *
    * Scale: state lives entirely in the target table; the stream side
    * holds no aggregation state, so arbitrarily long streams cost
    * per-batch merge work only (partition-pruned when the table is
    * partitioned — see [[graft.storage.Merge]]).
    *
    * txn bookkeeping reads/writes the op log AT `path` — when running
    * behind storage isolation pass the resolved (isolated) path, or
    * the txn records would land beside a table that lives elsewhere. */
  def mergeStream(storage: Storage, stream: DataFrame, path: String,
                  mergeCondition: String, checkpoint: String,
                  partitionFields: Seq[String] = Nil,
                  mergeSchemas: Boolean = false,
                  updateCondition: Option[String] = None,
                  insertCondition: Option[String] = None,
                  txnAppId: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val alreadyApplied = txnAppId.exists { app =>
          graft.storage.GraftLog.isManagedTable(spark, path) &&
            graft.storage.GraftLog.lastTxnBatch(spark, path, app)
              .exists(_ >= batchId)
        }
        if (!alreadyApplied) {
          storage.merge(batch, path, mergeCondition, partitionFields,
            mergeSchemas, updateCondition, insertCondition)
          txnAppId.foreach(app => graft.storage.GraftLog.append(
            spark, path, "TXN", Nil, Some(app -> batchId)))
        }
      }
      .start()
}
