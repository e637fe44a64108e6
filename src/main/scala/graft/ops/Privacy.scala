package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for tabular releases: k-anonymity
  * (no quasi-identifier equivalence class smaller than k) and
  * l-diversity (every class carries at least l distinct sensitive
  * values). The audit shape every privacy review runs before sharing
  * a dataset — here as one aggregate, not a per-rule rescan.
  */
object Privacy {

  /** Equivalence classes over `quasiCols` that violate k-anonymity
    * (fewer than k members) or l-diversity (fewer than l distinct
    * `sensitiveCol` values). Output: the quasi-identifier tuple,
    * `group_n`, `sensitive_distinct`, and the two violation flags —
    * only violating classes are returned (the release-blocking set).
    *
    * Scale shape: one partial-aggregated groupBy on the quasi tuple;
    * the exact distinct count rides the same shuffle (Spark plans
    * count+count(distinct) as a single two-phase expand). Violating
    * classes are by definition the SMALL ones, so the result is
    * bounded by data cardinality, not size. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "audit needs quasi-identifier columns")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col(sensitiveCol)).as("sensitive_distinct"))
      .withColumn("k_violation", col("group_n") < k)
      .withColumn("l_violation", col("sensitive_distinct") < l)
      .filter(col("k_violation") || col("l_violation"))
  }

  /** Generalization helper: band a numeric column to fixed-width
    * buckets (the standard quasi-identifier coarsening step) —
    * `floor(x / width) * width` as a long, null-preserving. */
  def band(c: Column, width: Long): Column =
    (floor(c / lit(width)) * lit(width)).cast("long")
}
