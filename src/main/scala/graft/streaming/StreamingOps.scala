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

  /** Streaming MERGE: CDC-style upserts into a managed table, one
    * [[Storage.merge]] per micro-batch via foreachBatch (the standard
    * Spark pattern for merge sinks — Delta's docs prescribe exactly
    * this shape for streaming upserts).
    *
    * Semantics: each micro-batch applies the merge condition against
    * the CURRENT table state, so later batches see earlier batches'
    * upserts. Delivery is at-least-once across restarts (foreachBatch
    * may replay the in-flight batch; an idempotent condition — upsert
    * keyed on a stable id — makes the replay harmless, the same
    * contract Delta documents for non-idempotent foreachBatch writes).
    *
    * Scale: state lives entirely in the target table; the stream side
    * holds no aggregation state, so arbitrarily long streams cost
    * per-batch merge work only (partition-pruned when the table is
    * partitioned — see [[graft.storage.Merge]]). */
  def mergeStream(storage: Storage, stream: DataFrame, path: String,
                  mergeCondition: String, checkpoint: String,
                  partitionFields: Seq[String] = Nil,
                  mergeSchemas: Boolean = false,
                  updateCondition: Option[String] = None,
                  insertCondition: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        storage.merge(batch, path, mergeCondition, partitionFields,
          mergeSchemas, updateCondition, insertCondition)
      }
      .start()
}
