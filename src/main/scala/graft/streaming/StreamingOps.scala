package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
