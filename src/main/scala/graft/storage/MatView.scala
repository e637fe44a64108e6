package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result of one [[MatView.refresh]] call. `mode` is the path taken:
  *  - `"noop"`        — the source op log has not moved; nothing read.
  *  - `"advance"`     — only content-invisible ops landed (OPTIMIZE,
  *                      constraint DDL); stamps advanced, state untouched.
  *  - `"incremental"` — the new change batches were folded in; only
  *                      `batchesApplied` batches and `groupsRescanned`
  *                      poisoned groups were read, never the full table.
  *  - `"rebuild"`     — something the feed cannot explain happened
  *                      (uncaptured mutation, RESTORE, ALTER, WAP
  *                      publish, crashed capture debris, feed prune);
  *                      the state was recomputed from the current
  *                      snapshot. Always correct, never silent.
  */
case class MatViewRefresh(mode: String, batchesApplied: Long,
                          groupsRescanned: Long)

/** Materialized aggregate views over managed tables, refreshed from
  * the Change Data Feed — Delta/Snowflake-style incremental view
  * maintenance re-expressed on this engine's own CDF sidecar
  * ([[Merge.changeFeed]]).
  *
  * A view is per-key decomposable partials — `cnt`, `nncnt` (values
  * contributing to sum: non-null after the decimal cast),
  * decimal-exact `sum`, `min`, `max` — of one value column.
  * Derived forms (avg, ratios) are computed at read time, never
  * stored, so the state stays mergeable (the [[graft.ops
  * .IncrementalAgg]] discipline, extended with `nncnt` so SQL null
  * semantics survive deletes: a group whose non-null values are all
  * gone reads `sum = null`, exactly what a recompute would say).
  *
  * Why this exists at 100 TB: a daily metrics rollup over a 100 TB
  * fact table costs a full scan per refresh if recomputed; from the
  * feed it costs O(|changes| + |affected groups|). The refresh folds
  * signed deltas — insert / update_postimage add, delete /
  * update_preimage subtract — which is exact for the abelian partials
  * (cnt, nncnt, sum). min/max are NOT invertible under deletes, so a
  * group is rescanned from the current table iff a removed value ties
  * or crosses its stored extreme (equality is the only reachable
  * case — a removed value below the stored min was never in the
  * group — but the guard is `<=`/`>=` for safety); the rescan is a
  * semi-join on the poisoned keys, touching those groups' rows only.
  *
  * Correctness against everything ELSE that can happen to a managed
  * table is delegation, not cleverness: the refresh classifies every
  * op-log row since its recorded fingerprint and takes the
  * incremental path ONLY when each new op is a captured MERGE/DELETE
  * whose batch is present and committed (plus content-invisible
  * OPTIMIZE / constraint DDL). Any other op — uncaptured mutation,
  * overwrite WRITE, RESTORE, ALTER, WAP_PUBLISH, MoR delete, feed
  * prune, vacuum's crash barrier — and any count mismatch between
  * mutation ops and committed batches triggers a full REBUILD from
  * the current snapshot. The view can therefore be stale (until the
  * next refresh) but never wrong.
  *
  * Concurrency: the refresh never locks the source. It fingerprints
  * the op log ([[Txn.snapshot]]) before reading, materializes the new
  * state into a staging dir, and [[Txn.assertUnchanged]] immediately
  * before the swap — a writer committing mid-refresh turns the
  * attempt into a retry (bounded by `maxAttempts`), not a torn view.
  * The sidecar carrying the applied-batch watermark lives INSIDE the
  * state dir and rides the same rename, so state and watermark can
  * never disagree (a watermark older than the state would double-
  * apply batches on the next refresh). The view itself assumes a
  * single maintainer, like every index sidecar in this engine.
  *
  * Extension surface (SURVEY §2.11): the incremental-metrics pattern
  * `q_incremental_agg` / `q_state_refresh` gesture at, completed —
  * those fold append-only batches the caller hands over; this folds
  * the table's OWN change feed, under arbitrary captured DML.
  */
object MatView {

  val SidecarName = "_graft_matview.json"

  /** Ops the feed fully explains (captured mutations) — one committed
    * change batch each. */
  private val MutationOps = Set("MERGE", "DELETE")

  /** Ops that cannot change table content — safe to step across. */
  private val InvisibleOps = Set("OPTIMIZE", "ADD_CONSTRAINT",
    "DROP_CONSTRAINT", "LOG_COMPACT")

  /** `schemaJson` is the state schema as Spark schema-JSON — the
    * empty-view lifeline: an all-rows-deleted refresh writes a parquet
    * dir with ZERO part files (Spark writes none for an empty frame),
    * and without the recorded schema the next read would die in
    * inference and wedge the view (the same failure mode
    * [[GraftLog.schemaSidecar]] exists for on tables). */
  case class Meta(source: String, keys: Seq[String], valueCol: String,
                  lastBatch: Long, logEntries: Long, logMaxSeq: Long,
                  schemaJson: String)

  private def sidecarPath(viewPath: String): String =
    viewPath.stripSuffix("/") + "/" + SidecarName

  // ------------------------------------------------------- sidecar IO

  private def metaJson(m: Meta): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(
      ("source" -> m.source) ~ ("keys" -> m.keys) ~
        ("valueCol" -> m.valueCol) ~ ("lastBatch" -> m.lastBatch) ~
        ("logEntries" -> m.logEntries) ~ ("logMaxSeq" -> m.logMaxSeq) ~
        ("schemaJson" -> m.schemaJson)))
  }

  private def saveMetaInto(spark: SparkSession, dir: String,
                           m: Meta): Unit =
    Fs.writeText(spark, dir.stripSuffix("/") + "/" + SidecarName,
      metaJson(m))

  def loadMeta(spark: SparkSession, viewPath: String): Meta = {
    val base = viewPath.stripSuffix("/")
    Fs.recoverAside(spark, base)
    val sc = sidecarPath(base)
    // the advance path swaps the sidecar FILE alone — heal its aside
    // too, or a crash between its two renames (live gone, __old
    // present) would brick every later refresh on a healthy view
    Fs.recoverAside(spark, sc)
    if (!Fs.exists(spark, sc))
      throw new IllegalArgumentException(
        s"$viewPath is not a materialized view (no $SidecarName)")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Fs.readText(spark, sc))
    def str(f: String) = (j \ f) match {
      case JString(s) => s
      case _ => throw new IllegalStateException(s"matview sidecar: $f")
    }
    def lng(f: String) = (j \ f) match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case _ => throw new IllegalStateException(s"matview sidecar: $f")
    }
    val keys = (j \ "keys") match {
      case JArray(items) => items.collect { case JString(s) => s }
      case _ => throw new IllegalStateException("matview sidecar: keys")
    }
    Meta(str("source"), keys, str("valueCol"), lng("lastBatch"),
      lng("logEntries"), lng("logMaxSeq"), str("schemaJson"))
  }

  // --------------------------------------------------------- partials

  /** Per-key (cnt, nncnt, sum, min, max) of `valueCol` — the stored
    * state shape. Decimal-exact sum (partition-order independent);
    * explicit final cast keeps the type stable across the fold path,
    * whose decimal addition would otherwise widen to (29,6) and fork
    * the parquet schema between rescanned and folded rows.
    *
    * `nncnt` counts the values that CONTRIBUTE TO SUM — non-null
    * after the decimal cast, not merely non-null: a value the cast
    * nulls out (overflow past decimal(28,6), NaN, Infinity) is
    * ignored by `sum` here, so the fold's null-restoration guard must
    * count by the same rule or an all-overflow group would fold to
    * sum = 0 where a recompute says NULL. min/max stay on the raw
    * values (a recompute's min ignores nothing non-null). */
  private def partials(df: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        count(col(valueCol).try_cast("decimal(28,6)")).as("nncnt"),
        sum(col(valueCol).try_cast("decimal(28,6)"))
          .cast("decimal(28,6)").as("sum"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))

  private def stateCols(keys: Seq[String]): Seq[String] =
    keys ++ Seq("cnt", "nncnt", "sum", "min", "max")

  /** The full-outer delta fold joins on the keys with null-UNSAFE
    * equality (Spark's join semantics): a null-valued key would
    * silently fork its group into unmerged rows, so views refuse
    * them. `frame` is state-sized or delta-sized — one cheap probe. */
  private def refuseNullKeys(frame: DataFrame, keys: Seq[String],
                             what: String): Unit = {
    val anyNull = keys.map(col(_).isNull).reduce(_ || _)
    if (!frame.filter(anyNull).isEmpty)
      throw new IllegalArgumentException(
        s"materialized view keys must be non-null; $what contains a " +
          s"null in ${keys.mkString(", ")}")
  }

  // ------------------------------------------------------ create/read

  /** Create a view of `source` at `viewPath`: per-key partials of
    * `valueCol`, stamped with the source's op-log fingerprint and
    * applied-batch watermark. Refuses an occupied destination. */
  def create(spark: SparkSession, storage: BasicStorage, source: String,
             viewPath: String, keys: Seq[String], valueCol: String,
             maxAttempts: Int = 3): MatViewRefresh = {
    require(keys.nonEmpty, "materialized view needs at least one key")
    val reserved = Set("cnt", "nncnt", "sum", "min", "max")
    val clash = keys.filter(k => reserved(k.toLowerCase))
    require(clash.isEmpty,
      s"key column(s) ${clash.mkString(", ")} collide with the view's " +
        s"aggregate columns (${reserved.mkString(", ")}) — rename or " +
        "alias them before creating the view")
    val base = viewPath.stripSuffix("/")
    Fs.recoverAside(spark, base)
    if (Fs.exists(spark, base))
      throw new IllegalArgumentException(
        s"matview destination already exists: $viewPath — refresh it, " +
          "or remove it to recreate")
    if (!GraftLog.isManagedTable(spark, source))
      throw new IllegalArgumentException(
        s"matview source is not a managed table: $source")
    withRetries(maxAttempts) {
      rebuildOnce(spark, storage, source.stripSuffix("/"), base, keys,
        valueCol)
    }
  }

  /** The view's state (cnt, nncnt, sum, min, max per key), with SQL
    * null semantics restored on `sum` at storage time already —
    * serve-ready. Underscore sidecar files are invisible to the
    * parquet read. An EMPTY view (every group deleted — zero part
    * files on disk) serves an empty frame with the sidecar's recorded
    * schema instead of dying in inference. */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val base = viewPath.stripSuffix("/")
    Fs.recoverAside(spark, base)
    if (Fs.listFiles(spark, base)
        .exists(f => !f.startsWith("_") && !f.startsWith(".")))
      spark.read.parquet(base)
    else {
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(loadMeta(spark, base).schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }
  }

  // ---------------------------------------------------------- refresh

  /** Bring the view up to date with its source. See the object doc
    * for the mode taken per op-log classification; every mode ends
    * with the view equal to a fresh recompute of the CURRENT source
    * snapshot (the invariant MatViewSpec pins against recompute). */
  def refresh(spark: SparkSession, storage: BasicStorage,
              viewPath: String, maxAttempts: Int = 3): MatViewRefresh = {
    val base = viewPath.stripSuffix("/")
    withRetries(maxAttempts) {
      val meta = loadMeta(spark, base)
      val source = meta.source
      val snap = Txn.snapshot(spark, source)
      if (snap.entries == meta.logEntries && snap.maxSeq == meta.logMaxSeq)
        MatViewRefresh("noop", 0L, 0L)
      else {
        // op-log rows appended since the recorded fingerprint, in
        // commit order. (timestamp, seq) is the engine's documented
        // total order (GraftLog.append); the log is op-count sized.
        val newOps = GraftLog.history(spark, source)
          .orderBy(col("timestamp"), col("seq"))
          .select("operation").collect().iterator
          .drop(meta.logEntries.toInt).map(_.getString(0)).toSeq
        val stamps = batchStamps(spark, source)
        val inRange = stamps.filter(_._1 > meta.lastBatch)
        val committed = inRange.filter(_._2).map(_._1).sorted
        val uncommittedInRange = inRange.exists(!_._2)
        val explainable =
          newOps.forall(op => MutationOps(op) || InvisibleOps(op)) &&
            !uncommittedInRange &&
            newOps.count(MutationOps) == committed.size
        if (!explainable)
          rebuildOnce(spark, storage, source, base, meta.keys,
            meta.valueCol, Some(snap))
        else if (committed.isEmpty) {
          // content-invisible ops only: advance the fingerprint so
          // later refreshes stop re-reading this span. Sidecar-only
          // single-file swap — the state is untouched, and a crash
          // leaves the old stamps, which merely re-classify.
          Txn.assertUnchanged(spark, source, snap, "MATVIEW ADVANCE")
          swapSidecar(spark, base, meta.copy(
            logEntries = snap.entries, logMaxSeq = snap.maxSeq))
          MatViewRefresh("advance", 0L, 0L)
        } else {
          applyIncremental(spark, storage, base, meta, snap, committed)
        }
      }
    }
  }

  // ----------------------------------------------------- inner phases

  /** (stamp, committed?) of every change-batch dir currently on disk —
    * driver metadata listing, never a data read. */
  private def batchStamps(spark: SparkSession,
                          source: String): Seq[(Long, Boolean)] = {
    val feedDir = source.stripSuffix("/") + "/" + Merge.ChangesDirName
    Fs.listSubdirs(spark, feedDir)
      .filter(_.startsWith("batch="))
      .map(d => d.stripPrefix("batch=").toLong)
      .map(b => (b, Merge.isBatchCommitted(spark, source, b)))
  }

  private def rebuildOnce(spark: SparkSession, storage: BasicStorage,
                          source: String, viewBase: String,
                          keys: Seq[String], valueCol: String,
                          snap0: Option[OpLogSnapshot] = None)
      : MatViewRefresh = {
    val snap = snap0.getOrElse(Txn.snapshot(spark, source))
    // every batch committed by now is reflected in the snapshot we are
    // about to read (mutations are serialized by the table lock; a
    // commit landing AFTER this listing moves the op log and fails the
    // assert below). Uncommitted stamps are excluded: a live capture's
    // merge will commit with its op-log row and be applied by the next
    // refresh; crashed debris never commits and is vacuum's to fence.
    val watermark = batchStamps(spark, source)
      .collect { case (b, true) => b }
      .maxOption.getOrElse(Long.MinValue)
    // the aggregation is materialized ONCE (state-sized), so the
    // null-key probe and the state write share a single source scan —
    // a rebuild costs exactly one pass over the fact table
    val state = partials(storage.read(source, "delta"), keys, valueCol)
      .localCheckpoint()
    refuseNullKeys(state, keys, "the source table")
    val out = state.select(stateCols(keys).map(col): _*)
    commitState(spark, viewBase, out,
      Meta(source, keys, valueCol, watermark, snap.entries, snap.maxSeq,
        out.schema.json),
      snap, "MATVIEW REBUILD")
    MatViewRefresh("rebuild", 0L, 0L)
  }

  private def applyIncremental(spark: SparkSession, storage: BasicStorage,
                               viewBase: String, meta: Meta,
                               snap: OpLogSnapshot,
                               committed: Seq[Long]): MatViewRefresh = {
    val source = meta.source
    val keys = meta.keys
    val v = col(meta.valueCol)
    // the batch partition column prunes the feed read to the new dirs
    val feed = Merge.changeFeed(spark, source)
      .filter(col("batch") > meta.lastBatch &&
        col("batch") <= committed.max)
    val sign = when(col("_change_type")
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    // dnncnt/dsum count and add by the DECIMAL-CAST value (partials'
    // rule): a value the cast nulls out contributes to neither, so
    // the fold's sum-null restoration matches a recompute exactly
    val vc = v.try_cast("decimal(28,6)")
    val deltas = feed.groupBy(keys.map(col): _*)
      .agg(
        sum(sign).as("dcnt"),
        sum(when(vc.isNotNull, sign).otherwise(0L)).as("dnncnt"),
        sum(when(vc.isNotNull, sign * vc)
          .otherwise(lit(0).cast("decimal(28,6)")))
          .cast("decimal(28,6)").as("dsum"),
        min(when(sign === 1L, v)).as("add_min"),
        max(when(sign === 1L, v)).as("add_max"),
        min(when(sign === -1L, v)).as("rem_min"),
        max(when(sign === -1L, v)).as("rem_max"))

    val s = read(spark, viewBase).withColumn("_s", lit(true)).as("s")
    val d = deltas.withColumn("_d", lit(true)).as("d")
    // materialized ONCE (state-sized — the same cost class as the
    // state write itself): the null-key probe, the poisoned-key
    // listing, and the fold all read this checkpoint instead of
    // re-running the feed scan + join per consumer
    val joined = s.join(d, keys, "full_outer").localCheckpoint()
    // a null key on either side would have forked unmerged in the
    // null-unsafe join above — refuse before folding anything (the
    // state side was refusal-clean at its own write; this catches
    // feed batches). Using-column join output coalesces the key, so
    // one probe covers both sides.
    refuseNullKeys(joined, keys, "the change feed")

    // a group must be rescanned from the table iff a removed non-null
    // value ties or crosses its stored extreme — the one case where
    // min/max are not incrementally maintainable — or removals hit a
    // key the state has never seen (insert-then-delete inside this
    // refresh window: the delta's own add_min/add_max may name rows
    // that were since removed).
    val poisoned = col("d._d").isNotNull && col("d.rem_min").isNotNull &&
      (col("s._s").isNull || col("s.min").isNull ||
        col("d.rem_min") <= col("s.min") || col("d.rem_max") >= col("s.max"))

    val foldedCnt = coalesce(col("s.cnt"), lit(0L)) +
      coalesce(col("d.dcnt"), lit(0L))
    val foldedNn = coalesce(col("s.nncnt"), lit(0L)) +
      coalesce(col("d.dnncnt"), lit(0L))
    val zero = lit(0).cast("decimal(28,6)")
    val folded = joined.filter(!poisoned)
      .select(
        keys.map(col) ++ Seq(
          foldedCnt.as("cnt"),
          foldedNn.as("nncnt"),
          when(foldedNn === 0L, lit(null).cast("decimal(28,6)"))
            .otherwise((coalesce(col("s.sum"), zero) +
              coalesce(col("d.dsum"), zero)).cast("decimal(28,6)"))
            .as("sum"),
          least(col("s.min"), col("d.add_min")).as("min"),
          greatest(col("s.max"), col("d.add_max")).as("max")): _*)
      // cnt can only reach 0 without poisoning when every removed row
      // carried a null value (non-null removals poison via the extreme
      // guard) — the group is gone; drop its row like a recompute would
      .filter(col("cnt") > 0L)

    val poisonedKeys = joined.filter(poisoned)
      .select(keys.map(col): _*)
    val nRescan = poisonedKeys.count()
    // the rescan branch joins the FACT TABLE — attach it only when a
    // group actually needs it, or every pure fold would schedule a
    // full source scan and merely hope AQE's empty-relation pass
    // elides it (MatViewSpec pins this functionally: a no-rescan
    // refresh succeeds with the source's data files hidden)
    val newState =
      if (nRescan == 0L) folded.select(stateCols(keys).map(col): _*)
      else {
        val rescanned = partials(
          storage.read(source, "delta")
            .join(poisonedKeys, keys, "left_semi"),
          keys, meta.valueCol)
        folded.select(stateCols(keys).map(col): _*)
          .unionByName(rescanned.select(stateCols(keys).map(col): _*))
      }
    commitState(spark, viewBase, newState,
      meta.copy(lastBatch = committed.max, logEntries = snap.entries,
        logMaxSeq = snap.maxSeq, schemaJson = newState.schema.json),
      snap, "MATVIEW REFRESH")
    MatViewRefresh("incremental", committed.size.toLong, nRescan)
  }

  /** Materialize the new state into a staging dir (sidecar inside,
    * riding the same rename), re-verify the source did not move while
    * we computed, then swap. A commit in the window throws
    * [[ConcurrentWriteException]] — the retry loop's signal. */
  private def commitState(spark: SparkSession, viewBase: String,
                          state: DataFrame, newMeta: Meta,
                          snap: OpLogSnapshot, action: String): Unit = {
    val tmp = viewBase + "__tmp"
    Fs.deleteChecked(spark, tmp)
    try {
      state.write.mode("overwrite").parquet(tmp)
      saveMetaInto(spark, tmp, newMeta)
      Txn.assertUnchanged(spark, newMeta.source, snap, action)
      if (!Fs.exists(spark, viewBase)) Fs.renameChecked(spark, tmp, viewBase)
      else Fs.swapInStaged(spark, viewBase, tmp)
    } catch {
      case e: Throwable =>
        try Fs.deleteChecked(spark, tmp)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  /** Single-file sidecar swap for stamp-only advances. A crash
    * between its renames is healed by loadMeta's file-level
    * recoverAside. */
  private def swapSidecar(spark: SparkSession, viewBase: String,
                          m: Meta): Unit = {
    val sc = sidecarPath(viewBase)
    Fs.recoverAside(spark, sc)
    val tmp = sc + "__tmp"
    Fs.deleteChecked(spark, tmp)
    Fs.writeText(spark, tmp, metaJson(m))
    Fs.swapInStaged(spark, sc, tmp)
  }

  private def withRetries(maxAttempts: Int)
                         (body: => MatViewRefresh): MatViewRefresh = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 0
    while (true) {
      attempt += 1
      try return body
      catch {
        case _: ConcurrentWriteException if attempt < maxAttempts => ()
        case e if attempt < maxAttempts && isSwapWindowRace(e) =>
          // a COW commit renames the source's root aside and back in
          // two steps; a lock-free read landing in that microsecond
          // window dies on a missing path or an uninferable dir. The
          // table is complete again by the next look — retry like a
          // concurrent commit (bounded: a GENUINELY missing source
          // exhausts the attempts and rethrows loudly).
          Thread.sleep(200)
      }
    }
    sys.error("unreachable")
  }

  /** Is this the transient crash of a read that landed inside a
    * concurrent COW swap's two-rename window (root briefly absent /
    * dir briefly empty)? Matched on the cause chain — Spark wraps
    * both in layers of execution/streaming exceptions. */
  private[storage] def isSwapWindowRace(e: Throwable): Boolean = {
    val seen = scala.collection.mutable.Set[Throwable]()
    def walk(t: Throwable): Boolean =
      t != null && seen.add(t) && (
        t.isInstanceOf[java.io.FileNotFoundException] ||
          Option(t.getMessage)
            .exists(m => m.contains("UNABLE_TO_INFER_SCHEMA") ||
              m.contains("PATH_NOT_FOUND")) ||
          walk(t.getCause))
    walk(e)
  }
}
