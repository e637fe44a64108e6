package graft.storage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Predicate DELETE on a managed table — the GDPR / right-to-be-
  * forgotten and retention-expiry shape: remove every row matching a
  * condition, leave everything else byte-identical where possible.
  *
  * Scale shape mirrors [[Merge]]'s write path: a partitioned table
  * rewrites ONLY partitions that contain matches (literal partition
  * predicates reach the scan as PartitionFilters; unaffected
  * directories are never opened, let alone rewritten), partitions
  * emptied by the delete are cleared explicitly (dynamic overwrite
  * skips them), and the unpartitioned fallback is a copy-on-write
  * rewrite through the checked no-data-loss-window swap. The pruned
  * frame is persisted so count + rewrite read the table's parquet
  * once. SQL DELETE null semantics: rows where the condition is null
  * are KEPT.
  */
object Delete {

  /** Delete rows matching `condition`; returns the number deleted. */
  def where(spark: SparkSession, storage: BasicStorage, path: String,
            condition: String): Long = {
    if (!GraftLog.isManagedTable(spark, path))
      throw new IllegalArgumentException(
        "The given path is not a Delta Table.")
    val base = path.stripSuffix("/")
    val parts = GraftLog.lastPartitioning(spark, base)
    val df = storage.read(base, "delta")
    val cond = coalesce(expr(condition), lit(false))

    if (parts.nonEmpty) {
      val partCols = parts.map(col)
      // metadata-bounded collect: one row per partition WITH matches
      val affected = df.filter(cond).select(partCols: _*)
        .distinct().collect().map(_.toSeq).toSeq
      if (affected.isEmpty) return 0L
      val prunePred = affected.map(vs =>
        parts.zip(vs).map { case (f, v) => col(f) <=> lit(v) }
          .reduce(_ && _)).reduce(_ || _)
      val pruned = df.filter(prunePred)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val deleted = pruned.filter(cond).count()
        val kept = pruned.filter(!cond)
        val present = kept.select(partCols: _*).distinct()
          .collect().map(_.toSeq).toSet
        kept.write.format("parquet")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(parts: _*)
          .mode("overwrite").save(base)
        // dynamic overwrite skips partitions with no surviving rows —
        // clear fully-deleted directories explicitly (same bookkeeping
        // as Merge's emptied-partition branch)
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        affected.filterNot(present.contains).foreach { values =>
          val dir = parts.zip(values).map { case (k, v) =>
            val vPath =
              if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
              else ExternalCatalogUtils.escapePathName(String.valueOf(v))
            ExternalCatalogUtils.escapePathName(k) + "=" + vPath
          }.mkString("/")
          Fs.delete(spark, s"$base/$dir")
        }
        GraftLog.append(spark, base, "DELETE", parts)
        deleted
      } finally pruned.unpersist()
    } else {
      val scanned = df
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val deleted = scanned.filter(cond).count()
        if (deleted == 0L) return 0L
        val tmp = base + "__graft_tmp"
        Fs.deleteChecked(spark, tmp)
        scanned.filter(!cond)
          .write.format("parquet").mode("overwrite").save(tmp)
        GraftLog.carryLogAndSwap(spark, base, tmp)
        GraftLog.append(spark, base, "DELETE", Nil)
        deleted
      } finally scanned.unpersist()
    }
  }
}
