package graft.storage

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level data skipping for managed parquet tables — the pruning
  * layer a Delta/Iceberg transaction log provides, rebuilt on a parquet
  * sidecar (no Delta jar in this environment, SURVEY.md §7).
  *
  * [[collectStats]] reads each data file's FOOTER (metadata only, no
  * row data) and records per-file min/max/null-count for chosen
  * columns in `<table>/_graft_stats`. [[prunedRead]] then drops files
  * whose [min,max] cannot intersect a requested range BEFORE Spark
  * ever lists them into a scan.
  *
  * Why this matters at 100 TB: partition pruning works only on
  * partition columns; for a selective predicate on anything else,
  * Spark must still schedule a task per file and let the parquet
  * reader's row-group filter reject it. With layout-correlated columns
  * (time-ordered ingest, range-repartitioned writes) file-level stats
  * remove those tasks entirely — the poor man's Z-order. Footer
  * reading is distributed (one task per file batch), so stats
  * collection itself scales with the cluster, and the stats table is
  * metadata-sized (files × columns).
  *
  * Pruning is CONSERVATIVE: files without recorded stats for the
  * column (later writes, unsupported types) are always kept, so a
  * pruned read is a superset of the matching rows — callers still
  * apply the row filter (exactly Delta's data-skipping contract).
  */
/** Output observer that refreshes the footer-stats sidecar for the
  * configured columns after every observed write/merge — metadata-only
  * work that scales with file count, not data size. Columns absent
  * from a written frame are skipped, so one observer serves tables of
  * different schemas. */
class DataSkippingObserver(columns: Seq[String]) extends StorageOutputObserver {
  override def update(df: DataFrame, outputPath: String): Unit = {
    val present = columns.filter(df.schema.fieldNames.contains)
    if (present.nonEmpty && df.sparkSession != null)
      DataSkipping.collectStats(df.sparkSession, outputPath, present)
  }
}

/** Output observer that auto-compacts a managed table when its
  * small-file count crosses a threshold — the background OPTIMIZE
  * loop every streaming/micro-batch ingest needs (each batch appends
  * a file; unchecked, a month of 1-minute batches is 43k files and
  * the table's scans die of task-scheduling overhead, not data).
  * Fires AFTER the observed write (observer contract), so the write
  * itself never pays the rewrite; the threshold bounds amortized
  * compaction cost to O(1/threshold) rewrites per write. Only counts
  * files for MANAGED tables (Optimize requires the op log); streaming
  * observers fire pre-start with no files yet — the count guard makes
  * that a no-op. */
class AutoCompactObserver(maxFiles: Int,
                          targetFileBytes: Long = 128L * 1024 * 1024)
    extends StorageOutputObserver {
  require(maxFiles > 1, s"maxFiles must be > 1, got $maxFiles")
  override def update(df: DataFrame, outputPath: String): Unit = {
    val spark = df.sparkSession
    if (spark == null || !GraftLog.isManagedTable(spark, outputPath))
      return
    val files = Fs.dataFiles(spark, outputPath)
    // what a compaction COULD get the table down to at this target:
    // once a table is simply big (achievable ≈ current), "over the
    // threshold" would re-trigger a full O(table) rewrite on EVERY
    // write — only compact when it at least halves the file count,
    // which keeps amortized rewrite cost bounded
    val achievable = math.max(1L,
      (files.map(_._2).sum + targetFileBytes - 1) / targetFileBytes)
    if (files.size > maxFiles && files.size >= 2 * achievable)
      Optimize.run(spark, new BasicStorage(spark), outputPath,
        targetFileBytes = targetFileBytes)
  }
}

object DataSkipping {
  val StatsDirName = "_graft_stats"

  def statsPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "/" + StatsDirName

  val statsSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("column", StringType),
    StructField("dtype", StringType),
    StructField("min", StringType),
    StructField("max", StringType),
    StructField("null_count", LongType),
    StructField("num_rows", LongType)))

  /** All data files of the table — delegated to the shared walk
    * ([[Fs.dataFiles]]) so skipping, compaction sizing, and file
    * counting agree on what counts as data. */
  private def dataFiles(spark: SparkSession, tablePath: String): Seq[String] =
    Fs.dataFiles(spark, tablePath).map(_._1)

  /** Sidecar shard count: one file up to ~200k stats rows, then one
    * shard per 200k — the sidecar stays a handful of files at any
    * realistic table size instead of a single ever-growing file whose
    * one-task write serializes the refresh. */
  private def statsShards(rowEstimate: Long): Int =
    math.max(1, math.min(64, (rowEstimate / 200000L).toInt + 1))

  /** The current sidecar as a DataFrame (empty frame with the stats
    * schema when none exists). */
  private def statsFrame(spark: SparkSession, tablePath: String): DataFrame =
    if (Fs.exists(spark, statsPath(tablePath)))
      spark.read.parquet(statsPath(tablePath))
        .select(statsSchema.fieldNames.map(col).toSeq: _*)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], statsSchema)

  /** Overwrite the sidecar from a stats frame. The frame usually READS
    * the old sidecar (incremental reuse), so it is materialized
    * (localCheckpoint — metadata-sized) before the overwrite destroys
    * its input. */
  private def writeSidecar(spark: SparkSession, tablePath: String,
                           df: DataFrame, rowEstimate: Long): DataFrame = {
    val materialized = df.localCheckpoint(true)
    materialized.repartition(statsShards(rowEstimate))
      .write.mode("overwrite").parquet(statsPath(tablePath))
    spark.read.parquet(statsPath(tablePath))
  }

  /** Read per-file column stats from parquet footers and write the
    * stats sidecar (overwrite — stats describe the current table
    * state). INCREMENTAL: rows in the existing sidecar for files that
    * still exist are reused, so refreshing after an append costs one
    * footer read per NEW file, not O(total files) — parquet files are
    * immutable (unique names per write), which is what makes reuse
    * sound. Footer reads run on executors; the reuse filter and the
    * coverage check are joins against the sidecar frame, so no
    * files × columns stats ever collect to the driver — only FILE
    * NAMES (the listing the driver already holds) cross the boundary.
    * Returns the stats as a DataFrame. */
  def collectStats(spark: SparkSession, tablePath: String,
                   columns: Seq[String]): DataFrame =
    // footers carry PHYSICAL names — translate a mapped table's
    // logical request once here; identity without a mapping
    collectStatsPhysical(spark, tablePath,
      ColumnMapping.physicalNames(spark, tablePath, columns))

  private def collectStatsPhysical(spark: SparkSession, tablePath: String,
                                   columns: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = dataFiles(spark, tablePath)
    // No data files (e.g. a stream sink observed before its first
    // batch): do NOT create a sidecar under a table dir that may not
    // exist yet — an empty stats dir would make `exists(path)` true and
    // derail auto-create logic downstream.
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], statsSchema)
    val filesDf = files.toDF("file")
    // reuse: EVERY existing row for still-live files — including
    // columns outside this call's request. An observer firing with a
    // narrower frame (schema-evolving merge) must not wipe the other
    // columns' stats for unchanged files.
    // inner join keeps only live files' rows; the file-name frame is a
    // local relation (the listing the driver already holds) and Spark
    // broadcasts it when small — no hint, so a huge listing can still
    // shuffle instead of OOMing the driver broadcast
    val reused: DataFrame =
      statsFrame(spark, tablePath).join(filesDf, Seq("file"))
    if (columns.isEmpty) return reused
    // files already covered for every requested column need no footer
    // read — names only come back, never the stats rows. Compare
    // against the DISTINCT request size: a duplicated column in the
    // request would otherwise make coverage unsatisfiable and every
    // refresh O(total files) again.
    val coveredFiles: Set[String] = reused
      .filter(col("column").isin(columns: _*))
      .groupBy(col("file"))
      .agg(countDistinct(col("column")).as("__nc"))
      .filter(col("__nc") === columns.distinct.size)
      .select("file").as[String].collect().toSet
    val toRead = files.filterNot(coveredFiles.contains)
    if (toRead.isEmpty) {
      return writeSidecar(spark, tablePath, reused,
        files.size.toLong * columns.size)
    }
    val confBc = spark.sparkContext.broadcast(
      new SerializableWritable(spark.sessionState.newHadoopConf()))
    val cols = columns
    val statsRows = spark.sparkContext
      .parallelize(toRead, math.max(1, math.min(toRead.size, 64)))
      .flatMap { file =>
        val conf = confBc.value.value
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(file), conf))
        try {
          val footer = reader.getFooter
          cols.flatMap { c =>
            var dtype: String = null
            var minV: Any = null
            var maxV: Any = null
            var nulls = 0L
            var rows = 0L
            var statsOk = true
            footer.getBlocks.asScala.foreach { block =>
              rows += block.getRowCount
              block.getColumns.asScala
                .filter(_.getPath.toDotString == c)
                .foreach { cc =>
                  val st = cc.getStatistics
                  if (st == null || st.isEmpty) statsOk = false
                  else {
                    if (st.getNumNulls >= 0) nulls += st.getNumNulls
                    else statsOk = false
                    if (st.hasNonNullValue) {
                      val tmm = typedMinMax(
                        st.genericGetMin.asInstanceOf[AnyRef],
                        st.genericGetMax.asInstanceOf[AnyRef])
                      val t = tmm._1
                      if (t == null) statsOk = false
                      else {
                        dtype = t
                        minV = if (minV == null) tmm._2 else minTyped(t, minV, tmm._2)
                        maxV = if (maxV == null) tmm._3 else maxTyped(t, maxV, tmm._3)
                      }
                    }
                  }
                }
            }
            if (!statsOk || dtype == null) None
            else Some(Row(file, c, dtype,
              String.valueOf(minV), String.valueOf(maxV), nulls, rows))
          }
        } finally reader.close()
      }
    // a re-read file gets fresh rows for the REQUESTED columns — keep
    // its reused rows for other columns (the file is unchanged; parquet
    // files are immutable, so those stats are still valid)
    val toReadDf = toRead.toDF("file")
    val keep = reused.join(toReadDf, Seq("file"), "left_anti")
      .union(reused.join(toReadDf, Seq("file"))
        .filter(!col("column").isin(columns: _*)))
    val df = spark.createDataFrame(statsRows, statsSchema).union(keep)
    writeSidecar(spark, tablePath, df, files.size.toLong * columns.size)
  }

  /** Map a parquet statistics value pair to (dtype tag, typed min/max).
    * Unsupported physical types → null tag (file stays unpruned). */
  private def typedMinMax(min: AnyRef, max: AnyRef): (String, Any, Any) =
    (min, max) match {
      case (a: java.lang.Long, b: java.lang.Long) => ("long", a.longValue, b.longValue)
      case (a: java.lang.Integer, b: java.lang.Integer) => ("long", a.longValue, b.longValue)
      case (a: java.lang.Double, b: java.lang.Double) => ("double", a.doubleValue, b.doubleValue)
      case (a: java.lang.Float, b: java.lang.Float) => ("double", a.doubleValue, b.doubleValue)
      case (a: org.apache.parquet.io.api.Binary, b: org.apache.parquet.io.api.Binary) =>
        ("string", a.toStringUsingUTF8, b.toStringUsingUTF8)
      case _ => (null, null, null)
    }

  private def cmp(dtype: String, a: Any, b: Any): Int = dtype match {
    case "long" => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case "string" =>
      // Parquet stats and Spark's UTF8String order strings by UTF-8
      // BYTES; Java String.compareTo orders by UTF-16 code units. The
      // two disagree for supplementary-plane characters (emoji sort
      // below ￿ in UTF-16 but above it in UTF-8) — comparing in
      // the wrong order could prune a file whose rows actually match.
      utf8Cmp(a.asInstanceOf[String], b.asInstanceOf[String])
  }

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def minTyped(t: String, a: Any, b: Any): Any = if (cmp(t, a, b) <= 0) a else b
  private def maxTyped(t: String, a: Any, b: Any): Any = if (cmp(t, a, b) >= 0) a else b

  /** Can-this-file's-[min,max]-intersect-[lower,upper], as a column
    * expression over one stats row, dispatching on the row's dtype tag.
    * Numeric stats compare after a cast (safe — min/max strings were
    * rendered FROM that type, and the when() guard keeps wrong-dtype
    * rows out of the branch); string stats compare directly — Spark
    * compares strings by UTF-8 binary order, the same order parquet
    * footer stats use. Bounds are parsed DRIVER-side (they are driver
    * values; an executor-side cast would throw under ANSI mode): a
    * bound that does not parse in the column's stat domain yields
    * lit(true) — skipping is only ever allowed to be conservative, so
    * unparseable means keep. */
  private def keepExpr(lower: Option[Any], upper: Option[Any])
    : org.apache.spark.sql.Column = {
    def parseBound(t: String, b: Any): Option[org.apache.spark.sql.Column] =
      try {
        t match {
          case "long" => Some(lit(String.valueOf(b).toLong))
          case "double" => Some(lit(String.valueOf(b).toDouble))
          case _ => Some(lit(String.valueOf(b)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    def forType(t: String): org.apache.spark.sql.Column = {
      def c(s: org.apache.spark.sql.Column) =
        if (t == "string") s else s.cast(t)
      def ok(bound: Option[Any],
             check: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        bound.flatMap(parseBound(t, _)).map(check).getOrElse(lit(true))
      ok(upper, u => c(col("min")) <= u) && ok(lower, l => c(col("max")) >= l)
    }
    when(col("dtype") === "long", forType("long"))
      .when(col("dtype") === "double", forType("double"))
      .when(col("dtype") === "string", forType("string"))
      .otherwise(lit(true)) // unknown dtype tag -> keep
  }

  /** Survivors of ALL (column, lower, upper) predicates over ONE
    * consistent snapshot: the file listing and the stats sidecar are
    * each read exactly once, however many predicates there are — a
    * per-predicate re-list would both multiply the dominant metadata
    * cost and race concurrent appends (a file added between listings
    * would be absent from one survivor set and wrongly dropped from
    * the intersection, breaking the superset contract).
    *
    * The prune is DISTRIBUTED: the stats sidecar is filtered/evaluated
    * as a DataFrame and only the DROPPED files' names reach the driver
    * — never the files × columns stats rows. Files without a stats row
    * for a predicate column never enter the dropped set, so the
    * conservative superset contract holds by construction. */
  private def survivingFiles(spark: SparkSession, tablePath: String,
                             preds: Seq[(String, Option[Any], Option[Any])])
    : Seq[String] = {
    import spark.implicits._
    val all = dataFiles(spark, tablePath)
    if (preds.isEmpty || !Fs.exists(spark, statsPath(tablePath))) return all
    // stats rows are keyed on PHYSICAL names (collected from parquet
    // footers); callers predicate in logical space — translate, or a
    // mapped rename would match stale stats of a DIFFERENT column and
    // prune wrongly (missing rows, silently). ONE sidecar load for
    // the whole predicate list — this is the lookup hot path
    val mapping = ColumnMapping.load(spark, tablePath)
    val phys = preds.map { case (c, lo, hi) =>
      (mapping.map(_.physicalOf(c)).getOrElse(c), lo, hi)
    }
    // a file is dropped iff SOME stats row for a predicate column
    // proves its range cannot intersect that predicate
    val violations = phys.map { case (column, lower, upper) =>
      col("column") === column && !keepExpr(lower, upper)
    }.reduce(_ || _)
    val dropped: Set[String] = statsFrame(spark, tablePath)
      .filter(col("column").isin(phys.map(_._1): _*))
      .filter(violations)
      .select("file").distinct().as[String].collect().toSet
    all.filterNot(dropped.contains)
  }

  /** Files that can hold rows with `column` in [lower, upper]
    * (inclusive; None = unbounded). Files lacking stats for the column
    * are kept conservatively. Driver-side over the metadata-sized
    * stats table. */
  def pruneFiles(spark: SparkSession, tablePath: String, column: String,
                 lower: Option[Any], upper: Option[Any]): Seq[String] =
    survivingFiles(spark, tablePath, Seq((column, lower, upper)))

  /** Read the table with file-level pruning for `column` ∈ [lower,
    * upper]. The result is a SUPERSET of matching rows (whole files) —
    * apply the row predicate on top, as with any data-skipping layer.
    * basePath keeps partition-directory columns intact. */
  def prunedRead(spark: SparkSession, tablePath: String, column: String,
                 lower: Option[Any], upper: Option[Any]): DataFrame =
    prunedReadMulti(spark, tablePath, Seq((column, lower, upper)))

  /** Multi-predicate pruning: a file survives only if EVERY
    * (column, lower, upper) range can intersect it — the file-level
    * mirror of a conjunctive WHERE clause, evaluated over one listing/
    * stats snapshot. */
  def prunedReadMulti(spark: SparkSession, tablePath: String,
                      preds: Seq[(String, Option[Any], Option[Any])])
    : DataFrame = {
    val files = survivingFiles(spark, tablePath, preds)
    val raw =
      if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
      else spark.read.option("basePath", tablePath).parquet(files.sorted: _*)
    // raw file reads surface physical names — map back to logical
    ColumnMapping.toLogical(spark, tablePath, raw)
  }

  /** Answer count / null-count / min / max for `column` from the stats
    * sidecar alone — ZERO data files opened: the "metadata-only query"
    * a Delta/Iceberg log answers instantly, rebuilt on the footer
    * sidecar. At 100 TB this is the difference between a dashboard
    * freshness probe costing one sidecar read (a few files) and a
    * full-table scan.
    *
    * Sound only with FULL coverage: every data file must carry a
    * stats row for the column (a file without stats could hide rows
    * past the recorded extremes), so this THROWS on partial coverage
    * rather than return a plausible wrong answer — run
    * [[collectStats]] first. Aggregation runs over the metadata-sized
    * sidecar frame; min/max re-typed from their string form by the
    * recorded dtype. Output: one row (column, dtype, n_rows, n_nulls,
    * min_v, max_v — extremes as strings, cast by the caller). */
  def metadataProfile(spark: SparkSession, tablePath: String,
                      column: String): DataFrame = {
    import spark.implicits._
    // stats rows are physical-named; answer under the asked-for
    // (logical) label
    val physCol =
      ColumnMapping.physicalNames(spark, tablePath, Seq(column)).head
    val files = dataFiles(spark, tablePath).map(normPath).toSet
    val stats = statsFrame(spark, tablePath)
      .filter(col("column") === physCol)
      .localCheckpoint(true) // tiny; read twice (coverage + aggregate)
    val covered = stats.select("file").as[String].collect()
      .map(normPath).toSet
    val uncovered = files -- covered
    require(uncovered.isEmpty,
      s"metadataProfile($column): ${uncovered.size} data file(s) have " +
        "no stats row — run collectStats first (a partial answer " +
        "could silently miss rows)")
    // numeric dtypes compare numerically, strings lexically — the same
    // comparator the pruning layer uses; the winner keeps its stored
    // string form (no lossy double round-trip for longs)
    stats.groupBy(col("column"), col("dtype"))
      .agg(
        sum(col("num_rows")).as("n_rows"),
        sum(col("null_count")).as("n_nulls"),
        // try_cast: a string-dtype group's values must not trip the
        // numeric branches (ANSI cast throws; the branch is unused)
        min(expr("try_cast(min AS BIGINT)")).cast("string").as("__min_l"),
        max(expr("try_cast(max AS BIGINT)")).cast("string").as("__max_l"),
        min(expr("try_cast(min AS DOUBLE)")).cast("string").as("__min_d"),
        max(expr("try_cast(max AS DOUBLE)")).cast("string").as("__max_d"),
        min(col("min")).as("__min_s"),
        max(col("max")).as("__max_s"))
      .select(lit(column).as("column"), col("dtype"), col("n_rows"),
        col("n_nulls"),
        when(col("dtype") === "long", col("__min_l"))
          .when(col("dtype") === "double", col("__min_d"))
          .otherwise(col("__min_s")).as("min_v"),
        when(col("dtype") === "long", col("__max_l"))
          .when(col("dtype") === "double", col("__max_d"))
          .otherwise(col("__max_s")).as("max_v"))
  }

  // ------------------------------------------------- Bloom file skipping

  val BloomDirName = "_graft_bloom"

  def bloomPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "/" + BloomDirName

  /** Scheme-insensitive path form shared by the driver's file listing
    * and `input_file_name()` (which returns a `file:`-qualified URI). */
  private def normPath(p: String): String =
    new Path(p).toUri.getPath

  /** Build per-file Bloom filters of `column` into the
    * `_graft_bloom` sidecar — POINT-lookup skipping for
    * high-cardinality columns where min/max ranges prune nothing
    * (scattered ids, hashes, UUIDs): a needle-in-haystack lookup
    * then touches ~1 file instead of all of them. The complement of
    * [[collectStats]]' range skipping, mirroring Delta/Iceberg's
    * bloom-filter file indexes.
    *
    * Build is ONE distributed scan of (input_file_name, column):
    * `BloomFilterAggregate` partials build executor-side per file and
    * only sketch bytes land in the sidecar (file-count rows) — the
    * driver never sees values. Values of any type enter as
    * `xxhash64(value)`, the same hash probed at prune time, so false
    * negatives are impossible (the [[graft.ops.BloomJoin]]
    * contract). */
  def collectBloom(spark: SparkSession, tablePath: String, column0: String,
                   expectedItemsPerFile: Long = 1000000L,
                   fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.{GraftColumnBridge => B}
    // the build scans raw files (physical names) and the sidecar is
    // probed in physical space too — translate once at entry
    val column =
      ColumnMapping.physicalNames(spark, tablePath, Seq(column0)).head
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItemsPerFile, fpp)
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        B.expression(xxhash64(col(column))),
        org.apache.spark.sql.catalyst.expressions.Literal(
          expectedItemsPerFile),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
    val blooms = spark.read.parquet(tablePath)
      .select(input_file_name().as("file"), col(column))
      .groupBy(col("file"))
      .agg(B.column(agg.toAggregateExpression()).as("bloom"))
      .select(col("file"), lit(column).as("column"), col("bloom"))
    // merge with other columns' sidecar rows (same reuse contract as
    // the stats sidecar); bloom rows for this column are rebuilt whole
    val existing =
      if (Fs.exists(spark, bloomPath(tablePath)))
        spark.read.parquet(bloomPath(tablePath))
          .filter(col("column") =!= column)
      else blooms.limit(0)
    val merged = blooms.union(existing).localCheckpoint(true)
    merged.coalesce(1).write.mode("overwrite")
      .parquet(bloomPath(tablePath))
    spark.read.parquet(bloomPath(tablePath))
  }

  /** Files that may contain ANY of `values` in `column`, by probing
    * each file's Bloom sketch. Probe hashes are computed by Spark's
    * own xxhash64 (one metadata-sized job — guarantees hash parity
    * with the build side); the sketch tests run executor-side over
    * the sidecar frame and only surviving file NAMES reach the
    * driver. Files without a sketch row for the column are kept —
    * the conservative superset contract of every skipping layer
    * here. */
  def pruneFilesBloom(spark: SparkSession, tablePath: String,
                      column0: String, values: Seq[Any]): Seq[String] = {
    import spark.implicits._
    // sketches are keyed on physical names (built from raw files)
    val column =
      ColumnMapping.physicalNames(spark, tablePath, Seq(column0)).head
    val all = dataFiles(spark, tablePath)
    if (values.isEmpty || all.isEmpty ||
        !Fs.exists(spark, bloomPath(tablePath)))
      return all
    // probe hashes must match the BUILD side's xxhash64(col) in the
    // column's own type: xxhash64 of int 42 differs from long 42L, so
    // an untyped literal (e.g. Seq(42) probing a bigint column) would
    // miss and prune files that DO contain the value — a wrong-rows
    // violation of the superset contract. Cast every probe literal to
    // the table column's DataType, read from ONE data file's footer
    // (`all` is already listed above) — a whole-table spark.read here
    // would re-list every file on the hot lookup path. basePath keeps
    // directory-PARTITION columns resolvable (a partition column never
    // appears in the leaf footer; its type comes from the path).
    val colType = spark.read.option("basePath", tablePath)
      .parquet(all.head).schema.fields
      .find(_.name == column).map(_.dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"pruneFilesBloom: column '$column' not in table at $tablePath"))
    val hashes = spark.range(1)
      .select(values.map(v => xxhash64(lit(v).cast(colType))): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    // ONE pass over the sidecar returns (file, survives) — probing and
    // the indexed-file set come from the same job (the hot lookup path
    // shouldn't pay two reads of the same parquet)
    val verdicts = spark.read.parquet(bloomPath(tablePath))
      .filter(col("column") === column)
      .select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .map { case (file, bytes) =>
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        (file, hashes.exists(bf.mightContainLong))
      }
      .collect()
      .map { case (f, keep) => normPath(f) -> keep }.toMap
    all.filter(f => verdicts.getOrElse(normPath(f), true))
  }

  /** Read the table pruned to files that may hold `values` in
    * `column`. Superset contract: apply the exact row predicate on
    * top (Bloom false positives keep whole files, never add rows the
    * row filter wouldn't). */
  def prunedReadBloom(spark: SparkSession, tablePath: String,
                      column: String, values: Seq[Any]): DataFrame = {
    val files = pruneFilesBloom(spark, tablePath, column, values)
    val raw =
      if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
      else spark.read.option("basePath", tablePath).parquet(files.sorted: _*)
    // raw file reads surface physical names — map back to logical
    ColumnMapping.toLogical(spark, tablePath, raw)
  }
}
