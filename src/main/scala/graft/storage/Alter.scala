package graft.storage

import org.apache.spark.sql.SparkSession

/** ALTER TABLE column surgery for managed tables — the
  * `RENAME COLUMN` / `DROP COLUMN` half of Delta's ALTER TABLE, in
  * BOTH of Delta's flavors:
  *  - [[renameColumn]]/[[dropColumn]]: explicit copy-on-write
  *    rewrites (the no-mapping mode) — pay the rewrite, get physical
  *    files whose names ARE the schema;
  *  - [[renameColumnMetadata]]/[[dropColumnMetadata]]: METADATA-ONLY
  *    via the [[ColumnMapping]] sidecar — at 100 TB the plan you
  *    actually want (a COW rename is a petabyte rewrite for a label
  *    change); zero data files touched, one sidecar swap, with
  *    [[materializeMapping]] as the explicit rewrite that clears the
  *    indirection. Partition columns stay COW-only (the directory
  *    layout is the column).
  * Every flavor rides the same commit lock and fence discipline as
  * every other mutation.
  *
  * What a column's NAME is load-bearing for, and what each operation
  * therefore does about it:
  *  - CHANGE FEED: captured batches carry the old name. Time-travel
  *    fencing alone is NOT enough — a replica maintained by
  *    [[graft.streaming.StreamingOps.replicateStream]] replays feed
  *    batches without consulting barrier horizons, so post-alter
  *    batches would union-merge onto a pre-alter replica as a
  *    silently-diverging schema mix (the old column all-stale, the
  *    new one all-null for untouched rows). Both operations therefore
  *    REFUSE while the feed retains any captured batch: prune the
  *    feed to its tip ([[Merge.pruneChangeFeed]]) and re-seed
  *    replicas under the new schema first. The alter still records a
  *    barrier ([[Merge.recordChangeBarrier]]) for the pruned-era
  *    stamps: travel below the alter refuses loudly.
  *  - CHECK CONSTRAINTS: conditions are SQL text. A rename/drop of a
  *    referenced column would break them silently-until-later — both
  *    operations REFUSE while any constraint references the column
  *    (drop the constraint first, re-add against the new name).
  *  - MoR TOMBSTONES: the sidecar holds key COLUMNS by name; surgery
  *    on a tombstone key would break the anti-join overlay — refused
  *    (compact first). Surgery on a non-key column leaves the sidecar
  *    meaningful and carries it.
  *  - PARTITIONING: renaming a partition column rewrites the layout
  *    under the new name and re-records the partitioning (an ALTER
  *    op-log entry, honored by [[GraftLog.lastPartitioning]]).
  *    DROPPING a partition column is refused — the layout IS the
  *    column.
  */
object Alter {

  /** Rename `from` to `to` (exact-case result, case-insensitive
    * matching — Spark's resolution rules). One COW rewrite under the
    * commit lock. */
  def renameColumn(spark: SparkSession, storage: BasicStorage,
                   path: String, from: String, to: String): Unit = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      val df = storage.read(base, "delta")
      val cols = df.schema.fieldNames.toSeq
      require(cols.exists(_.equalsIgnoreCase(from)),
        s"no column '$from' in (${cols.mkString(", ")})")
      // the from-column itself is excluded: a CASE-correcting rename
      // (value -> Value) is legitimate
      require(!cols.exists(c =>
          c.equalsIgnoreCase(to) && !c.equalsIgnoreCase(from)),
        s"column '$to' already exists")
      refuseRetainedFeed(spark, base, "rename")
      refuseConstraintRefs(spark, base, from, "rename")
      refuseTombstoneKey(spark, base, from, "rename")
      val parts = GraftLog.lastPartitioning(spark, base)
      val newParts = parts.map(p =>
        if (p.equalsIgnoreCase(from)) to else p)
      rewrite(spark, base, df.withColumnRenamed(from, to), newParts)
    }
  }

  /** Add a column of `dataType` (DDL string, e.g. "string",
    * "decimal(10,2)"), null for every existing row. One COW rewrite
    * under the commit lock.
    *
    * Unlike rename/drop, ADD needs NO feed refusal: captured batches
    * simply lack the column, and both replay directions already
    * handle that — [[Merge.replayChanges]] unions with
    * allowMissingColumns (a replica gets null, exactly matching the
    * source), and [[Merge.readAsOf]]'s documented schema-evolution
    * contract reconstructs pre-evolution rows as null under the
    * CURRENT schema. Constraints and tombstones cannot reference a
    * column that doesn't exist yet, so the only refusal is a name
    * collision. */
  def addColumn(spark: SparkSession, storage: BasicStorage,
                path: String, name: String, dataType: String): Unit = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      val df = storage.read(base, "delta")
      val cols = df.schema.fieldNames.toSeq
      require(!cols.exists(_.equalsIgnoreCase(name)),
        s"column '$name' already exists")
      // no occupied-name refusal here: the COW rewrite below
      // materializes any mapping (every old file is replaced under
      // logical names), so a name old files used to occupy is free
      // again — unlike merge schema evolution, which KEEPS the
      // mapping and projects to physical names, where the new column
      // would collide inside its own write projection
      val parts = GraftLog.lastPartitioning(spark, base)
      // fence = false: the add is travel-compatible (see scaladoc) —
      // the same reason evolving merges don't fence
      rewrite(spark, base,
        df.withColumn(name,
          org.apache.spark.sql.functions.lit(null).cast(dataType)),
        parts, fence = false)
    }
  }

  /** METADATA-ONLY rename via the [[ColumnMapping]] sidecar: no data
    * file is read or written — the rename is one crash-safe sidecar
    * swap, and every reader sees the new name through the mapping's
    * zero-cost projection. Same refusals as the COW flavor (retained
    * feed, constraint refs, tombstone keys) PLUS: partition columns
    * are refused (the physical `old=value` directory layout IS the
    * column — use [[renameColumn]], which rewrites the layout), and
    * the new name must not collide with a physical name old files
    * still occupy ([[ColumnMapping.refuseOccupied]]). Fences like the
    * COW flavor: pruned-era stamps must refuse below the alter. */
  def renameColumnMetadata(spark: SparkSession, storage: BasicStorage,
                           path: String, from: String, to: String): Unit = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      val df = storage.read(base, "delta")
      val cols = df.schema.fieldNames.toSeq
      require(cols.exists(_.equalsIgnoreCase(from)),
        s"no column '$from' in (${cols.mkString(", ")})")
      require(!cols.exists(c =>
          c.equalsIgnoreCase(to) && !c.equalsIgnoreCase(from)),
        s"column '$to' already exists")
      refuseRetainedFeed(spark, base, "rename")
      refuseConstraintRefs(spark, base, from, "rename")
      refuseTombstoneKey(spark, base, from, "rename")
      val parts = GraftLog.lastPartitioning(spark, base)
      require(!parts.exists(_.equalsIgnoreCase(from)),
        s"cannot metadata-rename partition column '$from': the " +
          "physical directory layout is keyed on it — use " +
          "renameColumn (one COW rewrite of the layout) instead")
      val m = ColumnMapping.load(spark, base)
        .getOrElse(ColumnMapping.Mapping(Map.empty, Nil))
      // chains collapse to the ORIGINAL physical name (a→b then b→c
      // stores a→c); a rename back to the exact physical name removes
      // the entry (identity again)
      val phys = m.physicalOf(from)
      // the occupied-name check excludes this column's OWN physical:
      // renaming back toward it is the identity/case-correcting case,
      // not a collision. Renaming onto ANOTHER column's occupied
      // physical (e.g. swapping two names through the mapping) is
      // refused — it would break the mapping's idempotency invariant;
      // materializeMapping is the escape hatch.
      if (!phys.equalsIgnoreCase(to))
        ColumnMapping.refuseOccupied(spark, base, Seq(to),
          s"rename column '$from' to '$to' on $base")
      val renames =
        if (phys == to) m.renames.filterNot(_._1.equalsIgnoreCase(phys))
        else m.renames.filterNot(_._1.equalsIgnoreCase(phys)) + (phys -> to)
      commitMapped(spark, base, parts, m.copy(renames = renames))
    }
  }

  /** METADATA-ONLY drop via the [[ColumnMapping]] sidecar: the bytes
    * stay in old files (reclaimed by the next genuine rewrite or
    * [[materializeMapping]]); the read projection never exposes them.
    * Same refusals as the COW flavor; partition columns refused. */
  def dropColumnMetadata(spark: SparkSession, storage: BasicStorage,
                         path: String, name: String): Unit = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      val df = storage.read(base, "delta")
      val cols = df.schema.fieldNames.toSeq
      require(cols.exists(_.equalsIgnoreCase(name)),
        s"no column '$name' in (${cols.mkString(", ")})")
      require(cols.size > 1, "cannot drop a table's only column")
      val parts = GraftLog.lastPartitioning(spark, base)
      require(!parts.exists(_.equalsIgnoreCase(name)),
        s"cannot drop partition column '$name' — the physical layout " +
          "is keyed on it; rewrite the table unpartitioned (or " +
          "re-partitioned) via a managed overwrite instead")
      refuseRetainedFeed(spark, base, "drop a column on")
      refuseConstraintRefs(spark, base, name, "drop")
      refuseTombstoneKey(spark, base, name, "drop")
      val m = ColumnMapping.load(spark, base)
        .getOrElse(ColumnMapping.Mapping(Map.empty, Nil))
      val phys = m.physicalOf(name)
      commitMapped(spark, base, parts, ColumnMapping.Mapping(
        m.renames.filterNot(_._1.equalsIgnoreCase(phys)),
        m.dropped :+ phys))
    }
  }

  /** The mapped alters' commit tail: fence (same contract as the COW
    * [[rewrite]]), record the ALTER op row, then the crash-safe
    * sidecar swap — the mapping write IS the commit instant (a crash
    * before it leaves the table byte- and schema-identical; the
    * barrier and op row it may have landed are harmless bookkeeping,
    * conservative-refusing and content-free respectively). */
  private def commitMapped(spark: SparkSession, base: String,
                           parts: Seq[String],
                           m: ColumnMapping.Mapping): Unit = {
    Merge.recordChangeBarrier(spark, base, "CHANGES_BARRIER", parts)
    GraftLog.append(spark, base, "ALTER", parts)
    ColumnMapping.save(spark, base, m)
  }

  /** Clear the column mapping with ONE explicit COW rewrite: the
    * logical schema becomes the physical one (files re-written under
    * logical names, dropped columns' bytes reclaimed) and the sidecar
    * drops with the swap. The escape hatch for every
    * occupied-physical-name refusal, and the space-reclaim pass after
    * metadata drops. Content and logical schema are UNCHANGED — no
    * fence, no feed refusal (captured batches are logical-space and
    * replay identically). Returns false when there was no mapping. */
  def materializeMapping(spark: SparkSession, storage: BasicStorage,
                         path: String): Boolean = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      if (ColumnMapping.load(spark, base).isEmpty) false
      else {
        val df = storage.read(base, "delta")
        val parts = GraftLog.lastPartitioning(spark, base)
        GraftLog.stageAndSwap(spark, base, df, parts,
          appendOp = Some("ALTER"), materializeMapping = true)
        true
      }
    }
  }

  /** Drop `name`. One COW rewrite under the commit lock. */
  def dropColumn(spark: SparkSession, storage: BasicStorage,
                 path: String, name: String): Unit = {
    val base = path.stripSuffix("/")
    requireManaged(spark, base)
    Txn.withTableLock(spark, base, "ALTER") {
      val df = storage.read(base, "delta")
      val cols = df.schema.fieldNames.toSeq
      require(cols.exists(_.equalsIgnoreCase(name)),
        s"no column '$name' in (${cols.mkString(", ")})")
      require(cols.size > 1, "cannot drop a table's only column")
      val parts = GraftLog.lastPartitioning(spark, base)
      require(!parts.exists(_.equalsIgnoreCase(name)),
        s"cannot drop partition column '$name' — the physical layout " +
          "is keyed on it; rewrite the table unpartitioned (or " +
          "re-partitioned) via a managed overwrite instead")
      refuseRetainedFeed(spark, base, "drop a column on")
      refuseConstraintRefs(spark, base, name, "drop")
      refuseTombstoneKey(spark, base, name, "drop")
      rewrite(spark, base, df.drop(name), parts)
    }
  }

  private def requireManaged(spark: SparkSession, base: String): Unit =
    if (!GraftLog.isManagedTable(spark, base))
      throw new IllegalArgumentException(
        "The given path is not a Delta Table.")

  /** The shared mutation tail: fence (pruned-era stamps must refuse
    * below the alter), then one [[GraftLog.stageAndSwap]] — the COW
    * rewrite, the ALTER op-log row recording the (possibly new)
    * partitioning, and the emptied-table schema sidecar under the NEW
    * schema all ride ONE atomic swap. A post-swap append would leave
    * a crash window where a partition-renamed table's log still named
    * the old column — every later mutation would resolve a column
    * that no longer exists, and the alter could not be re-run.
    *
    * A COW surgery MATERIALIZES any column mapping as part of its
    * rewrite (`out` is the post-surgery LOGICAL frame; it is staged
    * verbatim and the sidecar clears with the swap). Projecting back
    * to physical names instead would silently UNDO the surgery: a COW
    * rename of a mapped column writes the new name, toPhysical maps
    * nothing (the old logical name is gone from the frame), and the
    * carried sidecar re-aliases the files right back to the old
    * logical name on the next read — a petabyte rewrite that changes
    * nothing, with no error anywhere. Since the rewrite replaces
    * EVERY file, no old physical name survives and no mapping is
    * needed afterwards. */
  private def rewrite(spark: SparkSession, base: String,
                      out: org.apache.spark.sql.DataFrame,
                      parts: Seq[String], fence: Boolean = true): Unit = {
    if (fence)
      Merge.recordChangeBarrier(spark, base, "CHANGES_BARRIER", parts)
    GraftLog.stageAndSwap(spark, base, out, parts,
      appendOp = Some("ALTER"), materializeMapping = true)
  }

  /** See the class doc: replication replays feed batches without
    * consulting barriers, so surgery must not leave old-schema
    * batches behind for a replica to bind wrongly. */
  private def refuseRetainedFeed(spark: SparkSession, base: String,
                                 what: String): Unit =
    if (Merge.hasChanges(spark, base))
      throw new IllegalStateException(
        s"cannot $what $base: the change feed retains captured " +
          "batches that name the old schema — a replica replaying " +
          "them across the alter would silently diverge. Prune the " +
          "feed to its tip (Merge.pruneChangeFeed) and re-seed " +
          "replicas under the new schema, then alter")

  private def refuseConstraintRefs(spark: SparkSession, base: String,
                                   column: String, what: String): Unit = {
    val referencing = Constraints.list(spark, base).filter {
      case (_, condition) =>
        spark.sessionState.sqlParser.parseExpression(condition)
          .collect {
            // nameParts.head, not the joined name: a CHECK on a struct
            // FIELD (`s.x > 0`) references column `s`
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              a.nameParts.head
          }.exists(_.equalsIgnoreCase(column))
    }
    if (referencing.nonEmpty)
      throw new IllegalStateException(
        s"cannot $what column '$column': CHECK constraint(s) " +
          s"${referencing.map(_._1).mkString(", ")} reference it — " +
          "their SQL conditions would break; drop them first and " +
          "re-add against the new schema")
  }

  private def refuseTombstoneKey(spark: SparkSession, base: String,
                                 column: String, what: String): Unit = {
    val tp = MorDelete.tombstonePath(base)
    Fs.recoverAside(spark, tp)
    if (Fs.exists(spark, tp) &&
        spark.read.parquet(tp).schema.fieldNames
          .exists(_.equalsIgnoreCase(column)))
      throw new IllegalStateException(
        s"cannot $what column '$column': the merge-on-read tombstone " +
          "sidecar keys on it — run MorDelete.compact(...) first")
  }
}
