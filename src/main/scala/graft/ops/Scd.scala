package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history maintenance: turn a
  * change feed into versioned validity-interval rows, and fold new
  * change batches into a stored history without rebuilding it.
  *
  * The classic warehouse dimension pattern: each key carries one row
  * per distinct attribute "run" with `effective_from`/`effective_to`
  * bounds, a 1-based `version`, and an `is_current` flag on the open
  * interval. Consecutive feed rows with unchanged attributes collapse
  * into the run that started them.
  */
object Scd {

  /** Build the full SCD2 history from a change feed.
    *
    * `orderCols` orders each key's feed (first column is the event
    * time that becomes the validity bound; add tiebreakers after it —
    * equal-timestamp changes need a total order for the run split to
    * be deterministic). `attrCols` are the tracked attributes: a row
    * opens a new version iff its attribute struct differs (null-safe)
    * from the previous row's.
    *
    * Scale shape: ONE shuffle — both window passes (change detection,
    * then interval/version numbering over the collapsed runs) sort by
    * the same (key, orderCols) order, so Catalyst plans a single
    * exchange; the second sort sees only run-start rows. No joins, no
    * driver state.
    */
  def scd2FromChanges(df: DataFrame, keyCol: String,
                      orderCols: Seq[String],
                      attrCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scd2 needs at least one order column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val attrs = struct(attrCols.map(col): _*)
    val runs = df
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(attrs <=> col("__prev")))
      .drop("__prev")
    val tsCol = orderCols.head
    runs
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keyCol +: attrCols) ++
        Seq("effective_from", "effective_to", "version", "is_current")
        map col: _*)
  }

  /** Fold a new change batch into a stored SCD2 history WITHOUT
    * rebuilding it: only keys present in the batch are reprocessed —
    * their current (open) row is replayed as the seed change in front
    * of the new batch, the combined mini-feed re-runs the same
    * collapse, and versions continue from the stored counter. Closed
    * historical rows and untouched keys pass through by reference.
    *
    * Equality contract (spec-pinned): for any time split T,
    * `scd2Apply(scd2FromChanges(feed ≤ T), feed > T)` equals
    * `scd2FromChanges(feed)` — the incremental fold loses nothing.
    *
    * Scale shape: the affected-key set is batch-sized, so the rebuild
    * shuffles |batch keys| × (1 open row + their new changes), never
    * the stored history; untouched history is a semi/anti-join
    * passthrough. This is the state-table pattern: refresh cost tracks
    * the increment, not the accumulated dimension.
    *
    * The batch must not predate stored history (a change older than an
    * affected key's `effective_from` of its open row would rewrite
    * closed intervals — that is a rebuild, not a fold). */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String,
                orderCols: Seq[String],
                attrCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "scd2 needs at least one order column")
    val tsCol = orderCols.head
    val keys = changes.select(col(keyCol)).distinct()
    val untouched = dim.join(keys, Seq(keyCol), "left_anti")
    val affected = dim.join(keys, Seq(keyCol), "left_semi")
    val closed = affected.filter(!col("is_current"))
    // replay each affected key's open row as the seed "change" of the
    // mini-feed; tiebreaker columns take typed nulls (they sort first,
    // so at an equal timestamp the seed precedes real batch rows and
    // an unchanged-attribute batch row still collapses into it)
    val feedCols = (keyCol +: orderCols) ++ attrCols
    val seed = affected.filter(col("is_current"))
      .withColumn(tsCol, col("effective_from"))
      .select(col(keyCol) +: orderCols.map {
        case `tsCol` => col(tsCol)
        case c => lit(null).cast(changes.schema(c).dataType).as(c)
      } ++: attrCols.map(col): _*)
    val versionBase = affected.filter(col("is_current"))
      .select(col(keyCol), (col("version") - 1).as("__vbase"))
    val rebuilt = scd2FromChanges(
        seed.unionByName(changes.select(feedCols.map(col): _*)),
        keyCol, orderCols, attrCols)
      .join(versionBase, Seq(keyCol), "left")
      .withColumn("version",
        (col("version") + coalesce(col("__vbase"), lit(0))).cast("int"))
      .drop("__vbase")
    untouched.unionByName(closed).unionByName(rebuilt)
  }
}
