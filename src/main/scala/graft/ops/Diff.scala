package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two versions of a
  * keyed table: every key classified as insert / delete / update /
  * unchanged. The audit primitive behind incremental downstream
  * refresh ("what changed since the last run?") and pipeline
  * regression checks ("this code change should only touch X").
  *
  * Scale shape: ONE full-outer join on the key columns — both sides
  * shuffle once on the same key, nothing is collected, and the
  * usual follow-up (filter out `unchanged`) pushes below nothing it
  * shouldn't. Value comparison is null-safe per column (`<=>`), so a
  * null→value transition reads as an update, not a phantom match.
  */
object Diff {

  /** Classify `next` against `prev` by `keyCols`; value columns (all
    * non-key columns present in BOTH sides) compared null-safely.
    * Output: key columns + `change_type` in
    * insert|delete|update|unchanged. Keys must be unique per side
    * (snapshot semantics); duplicated keys produce a row per pair,
    * like any join. */
  def snapshotDiff(prev: DataFrame, next: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val valueCols = prev.columns.filterNot(keyCols.contains)
      .filter(next.columns.contains(_)).toSeq
    val p = prev.alias("__p")
    val n = next.alias("__n")
    val joinCond = keyCols.map(k =>
      col(s"__p.$k") <=> col(s"__n.$k")).reduce(_ && _)
    // presence flags must be null-proof even when every data column is
    // nullable — tag each side with a literal before the join
    val pt = p.withColumn("__p_present", lit(1))
    val nt = n.withColumn("__n_present", lit(1))
    val changed: Column =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(c =>
        !(col(s"__p.$c") <=> col(s"__n.$c"))).reduce(_ || _)
    pt.join(nt, joinCond, "full_outer")
      .select(
        keyCols.map(k =>
          coalesce(col(s"__n.$k"), col(s"__p.$k")).as(k)) :+
        when(col("__p_present").isNull, "insert")
          .when(col("__n_present").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged").as("change_type"): _*)
  }
}
