package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RESTORE — roll a managed table back to a time-travel stamp as a
  * first-class, capture-consistent mutation (Delta Lake's `RESTORE
  * TABLE ... TO VERSION AS OF` analogue; reference scope is the
  * jorvik storage layer's managed-table surface, extended the same
  * way merge/CDF/time-travel were).
  *
  * A restore is NOT a bare overwrite with old data: on a table with a
  * live change feed it must keep the timeline coherent in both
  * directions —
  *
  *  - **forward**: replicas ([[graft.streaming.StreamingOps
  *    .replicateStream]]) must replay the restore like any other
  *    mutation, so the restore captures its own change batch (the
  *    row-level diff current → target) under `_graft_changes`, with
  *    the same crash ordering as a captured merge: batch dir BEFORE
  *    the data rewrite, `_commit` marker AFTER it. Either crash side
  *    is loud (marker-less batch ⇒ readAsOf refuses, replication
  *    skips, vacuum fences+sweeps past the age horizon) — never a
  *    silently-wrong reconstruction.
  *  - **backward**: time travel ACROSS the restore keeps working.
  *    `readAsOf(s)` for any retained stamp `s` — including stamps of
  *    mutations the restore undid — still serves the state that was
  *    live at `s`, because the restore's own batch inverse-replays
  *    like any other. History is never rewritten, only extended.
  *
  * With `captureChanges = false` the restore fences instead (a change
  * barrier before the rewrite, same as an uncaptured merge/delete):
  * travel below the restore refuses loudly rather than reconstructing
  * across an uncaptured gap.
  *
  * Scale shape: the diff is ONE full-outer-style pass (two key-hash
  * joins over current ∪ target, both shuffled once on the key), the
  * rewrite is the same COW staging + checked swap every merge takes,
  * and nothing data-sized is ever collected. The restored layout
  * keeps the table's recorded partitioning
  * ([[GraftLog.lastPartitioning]]).
  *
  * Refused loudly when a merge-on-read tombstone sidecar exists:
  * tombstones are a logical overlay on CURRENT files, and a restore
  * would change what they apply to — `MorDelete.compact` first. */
object Restore {

  /** Restore `path` to the state [[Merge.readAsOf]] serves at
    * `asOfBatch`. Returns the captured restore batch's stamp (None
    * when `captureChanges = false`). `keyCols` must identify rows —
    * the same contract replication and time travel already carry. */
  def toStamp(spark: SparkSession, storage: BasicStorage, path: String,
              keyCols: Seq[String], asOfBatch: Long,
              captureChanges: Boolean = true): Option[Long] = {
    require(keyCols.nonEmpty, "restore needs the table's merge keys")
    val base = path.stripSuffix("/")
    // commit lock: the restore reconstructs from the files another
    // mutation would be replacing mid-flight — serialized like every
    // other mutation (Txn's lost-update class)
    Txn.withTableLock(spark, base, "RESTORE")(
      toStampLocked(spark, storage, base, keyCols, asOfBatch,
        captureChanges))
  }

  private def toStampLocked(spark: SparkSession, storage: BasicStorage,
                            base: String, keyCols: Seq[String],
                            asOfBatch: Long,
                            captureChanges: Boolean): Option[Long] = {
    // checked UNDER the lock: a racing MorDelete.deleteWhere landing
    // its sidecar between an outside check and the lock would let the
    // restore rewrite content the tombstones were never written
    // against — they would then hide or resurrect the wrong rows
    if (Fs.exists(spark, MorDelete.tombstonePath(base)))
      throw new IllegalStateException(
        s"table $base has a merge-on-read tombstone sidecar; a restore " +
          "would change what the tombstones apply to — run " +
          "MorDelete.compact(...) first, then restore")
    // the target snapshot reads CURRENT files + inverse replay, and the
    // COW swap deletes those files — every consumer below (the change
    // batch, the rewrite) must evaluate off one pinned copy
    val target = Merge.readAsOf(spark, storage, base, keyCols, asOfBatch)
      .persist()
    try {
      val current = storage.read(base, "delta")
      val parts = GraftLog.lastPartitioning(spark, base)

      // ---- change batch (computed from pre-rewrite files) ----
      val stamp: Option[Long] = if (captureChanges) {
        val s = Merge.nextBatchStamp()
        val dir = s"$base/${Merge.ChangesDirName}/batch=$s"
        buildChanges(current, target, keyCols)
          .write.mode("overwrite").format("parquet").save(dir)
        Some(s)
      } else {
        // uncaptured restore = feed gap, same fence-before-rewrite
        // discipline as an uncaptured merge/delete
        Merge.recordChangeBarrier(spark, base, "CHANGES_BARRIER", parts)
        None
      }

      // ---- data rewrite: COW staging + checked swap (keeps the op
      // log, the change feed, and constraint sidecars; a restore to
      // an EMPTY snapshot gets its schema sidecar INSIDE the staging,
      // riding the same atomic swap — stageAndSwap owns both). The
      // persisted target carries its plan's shuffle partition count
      // into the rewrite's files (no exchange feeds the write, AQE
      // cannot coalesce — guide §6); size the file count from the
      // current table's on-disk bytes, the cheap driver-listable
      // proxy for the restored snapshot's size ----
      GraftLog.stageAndSwap(spark, base,
        Fs.sizedForWrite(spark, target,
          Fs.dataFiles(spark, base).map(_._2).sum), parts)

      // marker lands only AFTER the rewrite — merge's crash ordering
      stamp.foreach(s => Fs.touch(spark,
        s"$base/${Merge.ChangesDirName}/batch=$s/${Merge.ChangesCommitMarker}"))
      GraftLog.append(spark, base, "RESTORE", parts)
      stamp
    } finally target.unpersist()
  }

  /** Row-level diff current → target in the change-feed format
    * (table columns + `_change_type` ∈ insert | update_preimage |
    * update_postimage | delete). [[Merge.readAsOf]] reconstructs DATA
    * under the CURRENT schema (pre-evolution rows read null — its
    * documented evolving-merge contract), so a restore across a
    * schema evolution keeps the evolved column all-null rather than
    * narrowing the schema: schema objects are never rolled back, data
    * is (RestoreSpec pins this). The column-set-mismatch branch below
    * is therefore a safety net for callers that hand-build snapshots:
    * fine-grained classification is unsound when column sets differ —
    * rows equal on the common columns could still differ on the
    * others — so the batch degrades to full replacement (every
    * current row a delete, every target row an insert). */
  private[storage] def buildChanges(current: DataFrame, target: DataFrame,
                                    keyCols: Seq[String]): DataFrame = {
    val curCols = current.columns.toSeq
    val tgtCols = target.columns.toSeq
    val tag = (df: DataFrame, t: String, cols: Seq[String]) =>
      df.select(cols.map(col) :+ lit(t).as("_change_type"): _*)
    if (curCols.toSet != tgtCols.toSet)
      return tag(current, "delete", curCols).unionByName(
        tag(target, "insert", tgtCols), allowMissingColumns = true)

    val c = current.alias("__c")
    val t = target.alias("__t")
    val keyEq = keyCols.map(k =>
      col(s"__c.$k") <=> col(s"__t.$k")).reduce(_ && _)
    // null-safe per-column comparison; map columns are unorderable and
    // un-comparable directly — canonicalize as sorted entry arrays
    // (equal maps always produce equal sorted entries), same treatment
    // the merge insert-detection path takes
    def canon(side: String, n: String): Column = {
      val isMap = current.schema.fields.exists(f =>
        f.name == n &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      if (isMap) array_sort(map_entries(col(s"$side.$n")))
      else col(s"$side.$n")
    }
    val valueCols = curCols.filterNot(keyCols.contains)
    val changed: Column =
      if (valueCols.isEmpty) lit(false)
      else valueCols.map(n => !(canon("__c", n) <=> canon("__t", n)))
        .reduce(_ || _)
    // key matching must be NULL-SAFE end to end: a plain-equality
    // anti-join never matches a NULL key, so a null-keyed row present
    // unchanged on both sides would be emitted as delete+insert (and
    // paired as an update candidate by the <=> join besides), and
    // replaying that batch would duplicate the row on replicas
    val deletes = tag(
      current.alias("__c").join(target.alias("__t"), keyEq, "left_anti")
        .select(curCols.map(n => col(s"__c.$n").as(n)): _*),
      "delete", curCols)
    val inserts = tag(
      target.alias("__t").join(current.alias("__c"), keyEq, "left_anti")
        .select(curCols.map(n => col(s"__t.$n").as(n)): _*),
      "insert", curCols)
    val updatedPairs = c.join(t, keyEq, "inner").filter(changed)
    val pre = updatedPairs.select(
      curCols.map(n => col(s"__c.$n").as(n)) :+
        lit("update_preimage").as("_change_type"): _*)
    val post = updatedPairs.select(
      curCols.map(n => col(s"__t.$n").as(n)) :+
        lit("update_postimage").as("_change_type"): _*)
    deletes.unionByName(pre).unionByName(post).unionByName(inserts)
  }
}
