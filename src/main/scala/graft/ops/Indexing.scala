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
  * The frame is materialized after step 1 because steps 2 and 3 both
  * consume it: range partitioning samples boundaries
  * nondeterministically, so recomputation could disagree with the
  * counted layout (same barrier discipline as
  * [[TimeSeries.resample]]'s grid). One materialization, no global
  * single-reducer stage, result independent of the sampled boundaries.
  *
  * `checkpointMode` picks the barrier's durability/cost point:
  *
  *  - `"local"` (default): `localCheckpoint()` — partitions go to
  *    executor block storage and LINEAGE IS TRUNCATED. Fastest, but
  *    2× transient footprint, and losing an executor after the
  *    checkpoint FAILS THE JOB (nothing left to recompute from).
  *    Right for local/ephemeral runs and short jobs.
  *  - `"reliable"`: `checkpoint()` to
  *    `spark.sparkContext.setCheckpointDir` (required, or Spark
  *    throws) — partitions written to the reliable FS; executor loss
  *    recovers by re-reading the checkpoint. The long-job /
  *    preemptible-cluster choice; costs one distributed write+read.
  *  - `"persist"`: `persist(MEMORY_AND_DISK)` — lineage kept, nothing
  *    truncated; evicted partitions recompute. Safe ONLY for
  *    single-action callers: both consumers then read the same
  *    shuffle files (exchange reuse), so the sampled boundaries
  *    cannot diverge; a second action after full eviction could
  *    re-sample and renumber.
  */
object Indexing {

  /** The nondeterminism barrier shared by every range-partition-then-
    * number operator ([[globalIndex]], `Sampling.systematicSample`):
    * pins the sampled range boundaries so the two consumers of the
    * partitioned frame can never see different layouts. Mode
    * semantics documented on the object. */
  private[ops] def materialize(df: DataFrame,
                               checkpointMode: String): DataFrame =
    checkpointMode match {
      case "local"    => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case "persist" =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case other => throw new IllegalArgumentException(
        s"checkpointMode must be local | reliable | persist, got '$other'")
    }

  /** Add `indexName` = dense rank 0..n-1 of `orderCol` (must be
    * unique — ties would make the numbering nondeterministic). */
  def globalIndex(df: DataFrame, orderCol: String,
                  indexName: String = "row_idx",
                  numPartitions: Int = 0,
                  checkpointMode: String = "local"): DataFrame = {
    val parts = {
      val p = if (numPartitions > 0)
        df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
      materialize(p.sortWithinPartitions(orderCol)
        .withColumn("__pid", spark_partition_id()), checkpointMode)
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
