package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern
  * that makes daily metrics affordable at 100 TB: keep a small STATE
  * table of decomposable partial aggregates (count, sum, min, max) per
  * key, and fold each new batch of raw data into it. The raw history
  * is scanned exactly once, ever; every refresh touches only the new
  * batch plus the state table. Non-decomposable forms (avg, ratios)
  * are derived FROM the state at read time — never stored, or they
  * stop being mergeable.
  *
  * The fold is a full-outer join on the keys with null-safe
  * coalescing: keys only in the state pass through untouched, new keys
  * enter with their batch aggregates, shared keys add. State-table
  * sized work — the join shuffles |state| + |batchAgg| rows, never the
  * raw history. Pairs with [[graft.storage.Merge]] when the state
  * lives in a managed table (upsert instead of rewrite).
  */
object IncrementalAgg {

  /** Aggregate one raw batch to per-key (cnt, sum, min, max) partials
    * of `valueCol` — the shape [[merge]] folds. Decimal-exact sum:
    * double sums are partition-order dependent, state tables must not
    * be. */
  def partials(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))

  /** Fold a batch's partials into the state: full-outer on `keys`,
    * counts/sums add, min/max fold, absent side contributes identity. */
  def merge(state: DataFrame, batchPartials: DataFrame,
            keys: Seq[String]): DataFrame = {
    val s = state.as("s")
    val b = batchPartials.as("b")
    val joined = s.join(b, keys, "full_outer")
    joined.select(
      keys.map(col) ++ Seq(
        (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("b.cnt"), lit(0L))).as("cnt"),
        (coalesce(col("s.sum"), lit(0).cast("decimal(28,6)")) +
          coalesce(col("b.sum"), lit(0).cast("decimal(28,6)"))).as("sum"),
        least(col("s.min"), col("b.min")).as("min"),
        greatest(col("s.max"), col("b.max")).as("max")): _*)
  }
}
