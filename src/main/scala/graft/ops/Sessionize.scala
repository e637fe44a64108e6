package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions
  * at inactivity gaps.
  *
  * Shape: one shuffle on the user key; gap detection and session
  * numbering are window functions over that partitioning; the per-
  * session rollup reuses the same shuffle (Catalyst chains the windows
  * and the groupBy on the identical partitioning — no extra exchange).
  * All arithmetic is integer epoch-seconds: deterministic everywhere.
  */
object Sessionize {

  /** Events with a session_id column: sessions break when the gap to
    * the previous event exceeds `gapSeconds`. */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     orderCol: String, gapSeconds: Long): DataFrame = {
    // order by integer epoch-seconds (not the raw timestamp): sub-second
    // precision varies by storage (ns parquet vs µs Spark), and the
    // session math is second-granular anyway — this keeps event order,
    // and therefore session ids, identical everywhere
    val epoch = unix_timestamp(col(tsCol))
    val w = Window.partitionBy(col(userCol))
      .orderBy(epoch.asc, col(orderCol).asc)
    val gap = epoch - lag(epoch, 1).over(w)
    val isStart = when(gap.isNull || gap > gapSeconds, 1).otherwise(0)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id",
        sum(col("__start")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .drop("__start")
  }

  /** Per-session rollup: event count, span in seconds, value total. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               orderCol: String, gapSeconds: Long,
               valueCol: Option[String] = None): DataFrame = {
    val withIds = withSessionIds(events, userCol, tsCol, orderCol, gapSeconds)
    val epoch = unix_timestamp(col(tsCol))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col(orderCol)).as("first_event"),
      (max(epoch) - min(epoch)).as("duration_sec")) ++
      valueCol.map(v => sum(col(v)).as("total_value"))
    withIds.groupBy(col(userCol), col("session_id"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
