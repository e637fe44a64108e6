package graft.storage

import org.apache.spark.sql.SparkSession

/** CLONE — Delta Lake's `CREATE TABLE dst CLONE src [VERSION AS OF]`
  * analogue: a new, fully INDEPENDENT managed table whose initial
  * content is a snapshot of the source (current, or any servable
  * time-travel stamp via [[Merge.readAsOf]]). The standard lakehouse
  * branching primitive: experiment against production data, stage a
  * risky migration, or hand a team a frozen copy — without either
  * side's later mutations touching the other.
  *
  * What travels and what doesn't, each deliberate:
  *  - DATA: deep-copied. A plain-parquet layout has no shared-file
  *    refcounting, so a "shallow" clone would break the moment either
  *    side's COW rewrite deleted a shared file — honesty over the
  *    zero-copy marketing. At 100 TB a clone is a parallel
  *    read+write of the snapshot, the same cost as any full rewrite.
  *  - PARTITIONING: carried (the clone is written through the managed
  *    path with the source's recorded layout).
  *  - CHECK CONSTRAINTS: carried — the table CONTRACT belongs to the
  *    data and a clone that silently shed its constraints would admit
  *    rows the source never could.
  *  - OP LOG / HISTORY: NOT carried. The clone starts a fresh history
  *    (WRITE + a CLONE provenance record naming the source and the
  *    cloned stamp); the source's history describes the source's
  *    mutations, not the clone's.
  *  - CHANGE FEED: NOT carried. Feed batches are the source's
  *    timeline; replaying them onto an independently-evolving clone
  *    would be wrong the moment the clone diverges. The clone is a
  *    never-fed table — its own feed era starts with its own first
  *    captured mutation.
  *  - MoR TOMBSTONES: refused loudly (compact first) — the sidecar's
  *    meaning depends on key columns this API is not told, and a
  *    clone that copied raw files without them would RESURRECT
  *    logically deleted rows.
  *
  * Concurrency: the clone READS the source like any other reader
  * (always a complete table — the swap discipline's guarantee) and
  * takes no lock on it; a source mutation committing mid-copy can
  * fail the read loudly (vanished files), never corrupt it — retry.
  * The destination is created fresh and refuses to overwrite. */
object Clone {

  /** Prefix of the op-log provenance record's txn app id:
    * `graft_clone_src:<source path>`, with the cloned stamp in
    * txn_batch (-1 = current content). Readable via
    * [[GraftLog.history]]; no engine read path filters on it. */
  val ProvenanceApp = "graft_clone_src:"

  def table(spark: SparkSession, storage: BasicStorage, src: String,
            dst: String, asOfBatch: Option[Long] = None,
            keyCols: Seq[String] = Nil): Unit = {
    val s = src.stripSuffix("/")
    val d = dst.stripSuffix("/")
    if (!GraftLog.isManagedTable(spark, s))
      throw new IllegalArgumentException(
        "The given path is not a Delta Table.")
    if (Fs.exists(spark, d))
      throw new IllegalArgumentException(
        s"clone destination $d already exists — clone never " +
          "overwrites; remove it first or pick a fresh path")
    if (Fs.exists(spark, MorDelete.tombstonePath(s)))
      throw new IllegalStateException(
        s"source $s has a merge-on-read tombstone sidecar; its logical " +
          "content depends on key columns — run MorDelete.compact(...) " +
          "first, then clone")
    require(asOfBatch.isEmpty || keyCols.nonEmpty,
      "an as-of clone reconstructs through the change feed and needs " +
        "the table's merge keys")
    val parts = GraftLog.lastPartitioning(spark, s)
    val content = asOfBatch match {
      case Some(b) => Merge.readAsOf(spark, storage, s, keyCols, b)
      case None => storage.read(s, "delta")
    }
    // through the managed write path: dst gets its own fresh op log;
    // dst is not managed yet, so no constraints gate this first write
    // (the content already satisfied the source's constraints)
    storage.write(content, d, "delta", "overwrite", parts)
    // an EMPTY snapshot (e.g. the source was fully emptied by a
    // delete-all and reads via its schema sidecar) writes zero parquet
    // files — record the schema at the clone too, or the clone is a
    // managed table no reader can infer
    if (Fs.dataFiles(spark, d).isEmpty)
      Fs.writeText(spark, GraftLog.schemaSidecar(d), content.schema.json)
    val srcConstraints = s + "/" + Constraints.DirName
    if (Fs.exists(spark, srcConstraints))
      Fs.copyDirChecked(spark, srcConstraints,
        d + "/" + Constraints.DirName)
    GraftLog.append(spark, d, "CLONE", parts,
      Some(ProvenanceApp + s -> asOfBatch.getOrElse(-1L)))
  }
}
