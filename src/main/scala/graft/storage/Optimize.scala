package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** OPTIMIZE for managed tables: small-file compaction plus optional
  * range clustering — the lakehouse maintenance pass Delta spells
  * `OPTIMIZE ... ZORDER BY`, rebuilt on parquet.
  *
  * Why it exists: streaming MERGE and frequent small appends produce
  * one file (or more) per micro-batch; at 100 TB a scan's task count —
  * and the namenode/list cost — is driven by FILE COUNT, not bytes.
  * Compaction rewrites the table into ~`targetFileBytes` files.
  * `clusterBy` additionally range-partitions and sorts rows so
  * [[DataSkipping]] file stats become tight and selective reads prune
  * hard (the poor man's Z-order, completing the skipping story).
  *
  * The rewrite is one distributed job (shuffle only when clustering —
  * pure compaction uses coalesce, which merges files with NO shuffle);
  * the swap is the same checked no-data-loss-window sequence the merge
  * uses; the op log records OPTIMIZE; tracked skipping stats are
  * re-collected afterwards.
  */
object Optimize {

  /** Compact (and optionally cluster) a managed table in place.
    *
    * `zOrder = true` with ≥2 numeric `clusterBy` columns interleaves
    * the columns' bits into one Z-value and range-partitions + sorts on
    * it: every clustering column's per-file min/max stays tight, so
    * [[DataSkipping]] prunes on ANY of them — plain (lexicographic)
    * range clustering only ever helps the leading column. The Z-value
    * is computed from EQUI-DEPTH (quantile) buckets per column — one
    * extra sketch-aggregate pass, metadata-sized at 100 TB — so skewed
    * columns cluster as well as uniform ones (see [[withZValue]]).
    *
    * Returns the number of data files after the rewrite. */
  /** `where` — Delta's `OPTIMIZE ... WHERE <partition predicate>`:
    * compact/cluster ONLY the matching partitions, leaving every
    * other partition's files byte-untouched. At 100 TB this is how
    * compaction actually runs — a daily pass over yesterday's hot
    * partitions, never a full-table rewrite. The predicate may
    * reference ONLY partition columns (validated; a data-column
    * predicate would silently DROP the non-matching rows of every
    * rewritten partition — compaction must be content-invisible).
    * Scoped rewrites stage EVERY affected partition's compacted copy
    * first, then swap each matched directory via rename-aside
    * ([[PartitionSwap]] — the shared partition-commit mechanism the
    * merge and delete partitioned paths use too): a complete copy of
    * every partition exists at every instant — unlike Spark's dynamic
    * partition overwrite commit, whose delete-then-rename leaves a
    * crashed partition MISSING with its rows stranded in an
    * unreadable staging dir. A crash mid-commit here leaves some
    * partitions compacted, some original, and possibly some riding in
    * the `__graft_partaside` sibling until [[Maintenance.vacuum]] (or
    * the next mutation, which heals at entry) restores them — never
    * data loss. */
  def run(spark: SparkSession, storage: BasicStorage, path: String,
          clusterBy: Seq[String] = Nil,
          targetFileBytes: Long = 128L * 1024 * 1024,
          zOrder: Boolean = false,
          where: Option[String] = None): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    if (!GraftLog.isManagedTable(spark, path))
      throw new IllegalArgumentException("The given path is not a Delta Table.")
    // commit lock: a compaction rewrites every row from the files a
    // concurrent mutation would be replacing — its swap would then
    // resurrect the pre-mutation content wholesale (Txn's lost-update
    // class, at its bluntest)
    Txn.withTableLock(spark, path, "OPTIMIZE")(runLocked(spark, storage,
      path.stripSuffix("/"), clusterBy, targetFileBytes, zOrder, where))
  }

  private def runLocked(spark: SparkSession, storage: BasicStorage,
                        base: String, clusterBy: Seq[String],
                        targetFileBytes: Long, zOrder: Boolean,
                        where: Option[String]): Long = {
    // (a crashed partition-scoped commit's aside was already healed
    // by Txn.withTableLock before this body ran)
    val parts = GraftLog.lastPartitioning(spark, base)

    // Remember which columns carry skipping stats — the swap replaces
    // the directory (sidecar included), so they are re-collected after.
    val trackedCols: Seq[String] =
      if (Fs.exists(spark, DataSkipping.statsPath(base)))
        spark.read.parquet(DataSkipping.statsPath(base))
          .select("column").distinct().collect().map(_.getString(0)).toSeq
      else Nil

    val df = storage.read(base, "delta")

    // OPTIMIZE WHERE: resolve the partition predicate to the affected
    // partition VALUE set (driver-collected metadata, bounded by
    // matched partitions — the merge/delete bookkeeping)
    val scope: Option[Seq[Seq[Any]]] = where.map { pred =>
      require(parts.nonEmpty,
        "OPTIMIZE WHERE needs a partitioned table — the predicate " +
          "scopes whole partition directories")
      val refs = spark.sessionState.sqlParser.parseExpression(pred)
        .collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }.distinct
      val nonPart = refs.filterNot(r => parts.exists(_.equalsIgnoreCase(r)))
      require(nonPart.isEmpty,
        s"OPTIMIZE WHERE may reference only partition columns " +
          s"(${parts.mkString(", ")}); got ${nonPart.mkString(", ")} — " +
          "a data-column predicate would drop the non-matching rows " +
          "of every rewritten partition")
      df.filter(expr(pred)).select(parts.map(col): _*)
        .distinct().collect().map(_.toSeq).toSeq
    }
    if (scope.exists(_.isEmpty))
      return fileCount(spark, base) // predicate matches nothing: no-op

    // the frame to rewrite and the bytes that size the rewrite — the
    // whole table, or just the affected partitions
    val work = scope match {
      case Some(aff) => Delete.prunedToAffected(spark, df, parts, aff)
      case None => df
    }
    val totalBytes = scope match {
      case Some(aff) =>
        aff.map(values =>
          dataBytes(spark,
            s"$base/${Fs.partitionDirName(parts, values)}")).sum
      case None => dataBytes(spark, base)
    }
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt

    // Hive-partitioned tables: the writer emits one file per partition
    // VALUE per task, so shaping must keep a partition's rows together
    // or an nFiles-way shuffle explodes into nFiles × dirs fragments —
    // the opposite of compaction. Leading the range/hash keys with the
    // partition columns bounds output at ~one file per dir per
    // overlapping task. (Dedup is case-insensitive: a clusterBy that
    // restates a partition column in different casing is the same
    // physical column.)
    val shapeKeys = (parts ++ clusterBy.filterNot(c =>
      parts.exists(_.equalsIgnoreCase(c)))).map(col)
    val zCols = clusterBy.filterNot(c => parts.exists(_.equalsIgnoreCase(c)))
    // zOrder input validation runs for ANY zOrder call — a single
    // surviving column degrades to range clustering (z-order of one
    // column IS its range order), but never silently skips type checks.
    if (zOrder && zCols.nonEmpty) requireNumeric(work, zCols)
    val shaped =
      if (clusterBy.nonEmpty && zOrder && zCols.size >= 2) {
        val keys = parts.map(col) :+ col("__graft_z")
        withZValue(spark, work, zCols)
          .repartitionByRange(nFiles, keys: _*)
          .sortWithinPartitions(keys: _*)
          .drop("__graft_z")
      } else if (clusterBy.nonEmpty)
        // range partitioning gives each output file a disjoint key
        // range; the within-partition sort tightens row-group stats too
        work.repartitionByRange(nFiles, shapeKeys: _*)
          .sortWithinPartitions(shapeKeys: _*)
      else if (parts.nonEmpty) {
        // hash on (partition cols, salt): each dir's rows spread over
        // ~filesPerDir tasks, so a large or skewed partition still
        // lands in ~targetFileBytes files instead of one arbitrarily
        // large single-task file; the salt is a deterministic row hash
        val dirCount = scope.map(_.size).getOrElse(
          math.max(1, Fs.dataFiles(spark, base)
            .map(f => new Path(f._1).getParent.toString).distinct.size))
        val filesPerDir = math.max(1, math.ceil(
          totalBytes.toDouble / targetFileBytes / dirCount).toInt)
        val salt = pmod(
          xxhash64(struct(work.columns.toIndexedSeq.map(col): _*)), lit(filesPerDir.toLong))
        val numTasks = math.min(math.max(nFiles.toLong, dirCount.toLong * filesPerDir), 10000L).toInt
        work.repartition(numTasks, parts.map(col) :+ salt: _*)
      } else work.coalesce(nFiles)

    // physical names on disk (column mapping; identity when unmapped)
    val physShaped = ColumnMapping.toPhysical(spark, base, shaped)
    scope match {
      case Some(aff) =>
        // scoped rewrite: stage the compacted copies of exactly the
        // matched directories, then swap each in via rename-aside;
        // every other partition's files stay byte-identical (the
        // whole point of OPTIMIZE WHERE at 100 TB)
        val tmp = base + "__graft_tmp"
        Fs.deleteChecked(spark, tmp)
        physShaped.write.format("parquet").partitionBy(parts: _*)
          .mode("overwrite").save(tmp)
        PartitionSwap.swap(spark, base, tmp, parts, replaced = aff)
        Fs.deleteChecked(spark, tmp)
      case None =>
        val tmp = base + "__graft_tmp"
        Fs.deleteChecked(spark, tmp)
        var writer = physShaped.write.format("parquet").mode("overwrite")
        if (parts.nonEmpty) writer = writer.partitionBy(parts: _*)
        writer.save(tmp)
        GraftLog.carryLogAndSwap(spark, base, tmp)
    }
    GraftLog.append(spark, base, "OPTIMIZE", parts)

    if (trackedCols.nonEmpty)
      DataSkipping.collectStats(spark, base, trackedCols)
    fileCount(spark, base)
  }

  /** Clean up (and when necessary, recover from) the debris a crashed
    * COW rewrite or swap leaves behind. Thin convenience front over
    * [[Maintenance.vacuum]] — ONE sweep implementation owns the
    * crash-window semantics (complete a fully-staged interrupted swap,
    * heal an aside whose live root is gone, drop stale tmp/old pairs,
    * sweep interior sidecar/generation debris, fence + remove
    * genuinely old orphaned change batches) so the two entry points
    * can never disagree on what is debris. Returns a human-readable
    * action log (empty = nothing to do); callers that want the typed
    * plan or `dryRun` use [[Maintenance.vacuum]] directly. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    val base = path.stripSuffix("/")
    Maintenance.vacuum(spark, path).map { a =>
      a.kind match {
        case "heal" if a.dest == base && a.target == base + "__graft_tmp" =>
          s"completed interrupted swap: ${a.target} -> ${a.dest}"
        case "heal" if a.dest == base =>
          s"restored table from ${a.target}"
        case "heal" => s"healed ${a.dest} from ${a.target}"
        case "fence" =>
          s"fenced change feed of ${a.target} at batch ${a.dest}"
        case "skip" => s"left ${a.target} alone (${a.detail})"
        case "compact-log" =>
          s"compacted op log of ${a.dest} (${a.detail})"
        case _ => s"removed ${a.target} (${a.detail})"
      }
    }
  }

  /** Bits of Z-resolution per clustering column: up to 2^16 buckets is
    * far finer than any file count; with many columns the budget shrinks
    * so the interleaved value stays inside the 63 non-sign bits of a
    * long (shift amounts past 63 would silently wrap under Java's
    * 6-bit shift masking and corrupt the curve). */
  private def zBits(nCols: Int): Int = math.min(16, 63 / nCols)

  private def requireNumeric(df: org.apache.spark.sql.DataFrame,
                             zCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.NumericType
    val nonNumeric = zCols.filterNot(c =>
      df.schema.fields.find(_.name.equalsIgnoreCase(c))
        .exists(_.dataType.isInstanceOf[NumericType]))
    if (nonNumeric.nonEmpty)
      throw new IllegalArgumentException(
        s"zOrder supports numeric clustering columns; not numeric: " +
          nonNumeric.mkString(", "))
  }

  /** Number of equi-depth CDF knots per clustering column. 64 pieces
    * bound the driver state and the generated search tree while giving
    * 1/64-quantile resolution to the skew adaptation; WITHIN a piece
    * the mapping interpolates linearly, so the full 2^bits bucket
    * resolution is preserved. */
  private val CdfKnots = 64

  /** `df` plus an interleaved `__graft_z` Z-value column for `zCols`.
    *
    * Buckets are EQUI-DEPTH, not fixed-width: one aggregate pass
    * collects `CdfKnots` approx-percentile knots per column (a
    * distributed sketch — bounded memory at any scale, only knots×cols
    * doubles reach the driver); each value maps through the
    * piecewise-linear CDF those knots define (codegen'd binary search,
    * [[graft.functions.CdfBucketExpr]], ~log2(64) comparisons/row) and the [0,1] CDF
    * value buckets uniformly into [0, 2^bits). Fixed-width buckets
    * degrade on skew — a heavy-tailed column with range ≫ mass
    * concentration collapses most rows into bucket 0, the Z-values
    * tie, and the range partitioner (which cannot split equal keys)
    * emits one giant file. Equi-depth bucketing spreads any
    * distribution ~uniformly, so files stay balanced and per-file
    * stats stay selective. Bucket bits interleave round-robin so no
    * column dominates the sort prefix. Nulls bucket to 0 (they cluster
    * together, like a NULLS FIRST sort).
    *
    * Each column's bucket value is MATERIALIZED as a real column before
    * the bit interleave. The interleave references its bucket once per
    * bit — as a raw Column expression that means 16 embedded copies of
    * the bucket expression per clustering column, and every analyzer/
    * optimizer rule and the codegen pass walks all of them (measured 4×
    * slower end-to-end on q_zorder when the bucket expression was the
    * 63-piece when-tree). Through a materialized column the bits
    * reference a cheap attribute, the bucket expression appears exactly
    * once per column, and CollapseProject keeps it that way (it never
    * inlines a non-trivial producer with multiple consumers). */
  private def withZValue(spark: SparkSession,
                         df: org.apache.spark.sql.DataFrame,
                         zCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val ZBits = zBits(zCols.size)
    val percentages = array((0 to CdfKnots).map(k =>
      lit(k.toDouble / CdfKnots)): _*)
    // Sketch accuracy 1000 resolves ~1/1000 quantiles — 8× finer than
    // the 1/(2·64) the knot grid can even express, at ~10× less sketch
    // build/merge cost than the accuracy-10000 first cut (measured
    // 5.5 s → 25 s on q_zorder at sf0.1; knot values move by < one
    // knot spacing, so file balance is unchanged).
    val aggs = zCols.map(c =>
      percentile_approx(col(c).cast("double"), percentages, lit(1000)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = (1L << ZBits) - 1
    val bucketCols = zCols.zipWithIndex.map { case (c, i) =>
      val knots: Seq[(Double, Double)] =
        if (row.isNullAt(i)) Nil
        else {
          val vals = row.getSeq[Double](i)
          // compress ties to a strictly increasing sequence, keeping
          // the HIGHEST cdf per value: a heavy repeated value maps to
          // one bucket (identical rows are identical — nothing can
          // split them) and the pieces around it stay well-defined
          (0 to CdfKnots).map(k => (vals(k), k.toDouble / CdfKnots))
            .groupBy(_._1).map { case (v, qs) => (v, qs.map(_._2).max) }
            .toSeq.sortBy(_._1)
        }
      if (knots.size < 2) lit(0L)
      else {
        // Piece lookup + interpolation as ONE codegen'd binary search
        // (graft.functions.CdfBucketExpr). Both column-algebra
        // formulations measured badly in this per-row hot path: a
        // balanced 63-piece when-tree made janino compilation of the
        // generated Java dominate the clustered write (~4.5 s of 6 s
        // at sf0.1), and a size(filter(knotArray, v >= _)) counting
        // loop is a higher-order function — interpreted per row per
        // element and a whole-stage-codegen break in the rewrite
        // projection (measured ~3× on q_zorder end-to-end).
        when(col(c).isNull, 0L)
          .otherwise(graft.functions.CdfBucketExpr.cdfBucket(
            col(c).cast("double"), knots.map(_._1), knots.map(_._2),
            buckets))
      }
    }
    val n = bucketCols.size
    val names = zCols.indices.map(i => s"__graft_zb_$i")
    val withBuckets = df.withColumns(names.zip(bucketCols).toMap)
    val z = (for {
      (name, i) <- names.zipWithIndex
      j <- 0 until ZBits
    } yield shiftleft(shiftright(col(name), j).bitwiseAND(lit(1L)), j * n + i))
      .reduce(_ bitwiseOR _)
    withBuckets.withColumn("__graft_z", z).drop(names: _*)
  }

  private def dataBytes(spark: SparkSession, base: String): Long =
    Fs.dataFiles(spark, base).map(_._2).sum

  private def fileCount(spark: SparkSession, base: String): Long =
    Fs.dataFiles(spark, base).size.toLong
}
