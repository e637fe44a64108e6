package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality reconnaissance pass run before
  * a table enters a pipeline: per-column row/null/distinct counts and
  * numeric ranges, as a FRAME (one row per column) so profiles can be
  * stored, diffed across snapshots ([[Diff.snapshotDiff]] on
  * col_name), and asserted against expectations.
  */
object Profile {

  /** Exact profile of numeric (castable-to-double) columns: one row
    * per column with n_rows, n_nulls, n_distinct, min_v, max_v.
    *
    * Scale shape: ONE aggregation pass over the table computes every
    * column's stats (the per-column distinct counts make Catalyst
    * expand the input ~|cols| ways before the partial agg — the
    * standard multi-distinct plan; still one scan, no joins), then the
    * single result row is unpivoted driver-free by exploding an array
    * of per-column structs. For corpus-scale tables where exact
    * distincts don't pay, swap `approx_count_distinct` in — the shape
    * is otherwise identical. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggExprs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    df.agg(aggExprs.head, aggExprs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))): _*)).as("p"))
      .select("p.*")
  }
}
