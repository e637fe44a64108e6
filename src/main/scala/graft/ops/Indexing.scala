package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbering — the "assign every training sample
  * a stable 0..n-1 id" step (shard manifests, sample addressing,
  * resumable dataloaders want dense ids, not
  * `monotonically_increasing_id`'s sparse partition-encoded values).
  *
  * The naive form — `row_number() OVER (ORDER BY key)` with no
  * partition — funnels the whole table through ONE reducer; at 100 TB
  * that is the job. This implementation keeps the numbering exact but
  * distributes the sort:
  *
  *  1. range-repartition + local sort by the key (the same two stages
  *     a global `orderBy` plans — every partition holds a contiguous
  *     key range),
  *  2. count rows per partition (a metadata-sized aggregate:
  *     numPartitions rows reach the cumulative-offset window),
  *  3. broadcast the offsets back and add them to a PARTITION-LOCAL
  *     row_number — each partition numbers itself in parallel.
  *
  * The frame is localCheckpoint'ed after step 1 because steps 2 and 3
  * both consume it: range partitioning samples boundaries
  * nondeterministically, so recomputation could disagree with the
  * counted layout (same barrier discipline as
  * [[TimeSeries.resample]]'s grid). One materialization, no global
  * single-reducer stage, result independent of the sampled boundaries.
  */
object Indexing {

  /** Add `indexName` = dense rank 0..n-1 of `orderCol` (must be
    * unique — ties would make the numbering nondeterministic). */
  def globalIndex(df: DataFrame, orderCol: String,
                  indexName: String = "row_idx",
                  numPartitions: Int = 0): DataFrame = {
    val parts = {
      val p = if (numPartitions > 0)
        df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
      p.sortWithinPartitions(orderCol)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
    }
    val offsets = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    parts
      .join(broadcast(offsets), "__pid")
      .withColumn(indexName,
        col("__off") - 1L +
          row_number().over(
            Window.partitionBy(col("__pid")).orderBy(col(orderCol))))
      .drop("__pid", "__off")
  }
}
