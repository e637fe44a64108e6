package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.streaming.StreamingQuery

/** Storage wrapper isolating reads/writes under a per-context folder
  * (branch/user/cluster). Reference: jorvik/storage/isolation.py.
  *
  * Reads fall back to the production path when no isolated copy exists;
  * writes always target the isolated path; merge targets the isolated
  * copy only if present.
  */
class IsolatedStorage(val storage: Storage, spark: SparkSession,
                      verbose: Boolean = false,
                      isolationProvider: () => String = () => "")
    extends Storage {

  private def conf(key: String, default: String): String =
    spark.conf.getOption(key)
      .orElse(Option(spark.sparkContext.getConf.get(key, null)))
      .getOrElse(default)

  /** isolation.py:31-64 — includes the isolation-folder existence check. */
  def createIsolationPath(path: String): String = {
    val mountPoint = IsolationPaths.normalizeMountPoint(
      conf("io.jorvik.storage.mount_point", ""))
    val folder = conf("io.jorvik.storage.isolation_folder", "jorvik_isolation")
      .stripPrefix("/").stripSuffix("/")
    val mounted = s"$mountPoint/$folder"
    if (!storage.exists(mounted))
      throw new RuntimeException(
        s"Isolation folder: $mounted does not exist! Have you mounted it?")
    IsolationPaths.createIsolationPath(
      conf("io.jorvik.storage.mount_point", ""), folder,
      isolationProvider(), path)
  }

  /** isolation.py:66-83. Defaults the folder to jorvik_isolation so
    * create/remove are symmetric (the reference requires the conf key to
    * be set explicitly here and throws otherwise). */
  def removeIsolationPath(path: String): String =
    IsolationPaths.removeIsolationPath(
      conf("io.jorvik.storage.isolation_folder", "jorvik_isolation"),
      isolationProvider(), path)

  private def verboseOutput(path: String, operation: String,
                            format: String): Unit = if (verbose) {
    println(IsolationPaths.verbosePathLine(
      conf("io.jorvik.storage.mount_point", ""), path, operation))
    if ((operation == "Merging" || operation == "Reading") && format == "delta")
      printLastUpdated(path)
  }

  /** isolation.py:85-123 — history from the _graft_log sidecar. */
  private def printLastUpdated(path: String): Unit = {
    val updateTs =
      if (!GraftLog.isManagedTable(spark, path)) None
      else GraftLog.history(spark, path)
        .filter(col("operation").isin("WRITE", "MERGE", "STREAMING"))
        .limit(1)
        .select(max(col("timestamp")).alias("latest_update"))
        .head().getAs[java.sql.Timestamp](0) match {
          case null => None
          case ts => Some(ts)
        }
    updateTs match {
      case Some(ts) =>
        val elapsed = (System.currentTimeMillis() - ts.getTime) / 1000
        println(IsolationPaths.lastUpdatedMessage(elapsed))
      case None =>
        println("No WRITE, MERGE, or STREAMING operations found in Delta table history.\n")
    }
  }

  override def exists(path: String): Boolean = storage.exists(path)

  override def read(path: String, format: String,
                    options: Map[String, String] = Map.empty): DataFrame = {
    val iso = createIsolationPath(path)
    val target = if (exists(iso)) iso else path
    verboseOutput(target, "Reading", format)
    storage.read(target, format, options)
  }

  override def readStream(path: String, format: String,
                          options: Map[String, String] = Map.empty): DataFrame = {
    val iso = createIsolationPath(path)
    val target = if (exists(iso)) iso else path
    verboseOutput(target, "Reading", format)
    storage.readStream(target, format, options)
  }

  /** Force-read the production (non-isolated) path (isolation.py:253-272). */
  def readProductionData(path: String, format: String,
                         options: Map[String, String] = Map.empty): DataFrame = {
    val prod = removeIsolationPath(path)
    verboseOutput(prod, "Reading", format)
    storage.read(prod, format, options)
  }

  override def write(df: DataFrame, path: String, format: String, mode: String,
                     partitionFields: Seq[String] = Nil,
                     options: Map[String, String] = Map.empty): Unit = {
    val iso = createIsolationPath(path)
    verboseOutput(path, "Writing", format)
    storage.write(df, iso, format, mode, partitionFields, options)
  }

  override def writeStream(df: DataFrame, path: String, format: String,
                           checkpoint: String,
                           partitionFields: Seq[String] = Nil,
                           options: Map[String, String] = Map.empty): StreamingQuery = {
    val iso = createIsolationPath(path)
    verboseOutput(path, "Writing", format)
    storage.writeStream(df, iso, format, checkpoint, partitionFields, options)
  }

  override def merge(df: DataFrame, path: String, mergeCondition: String,
                     partitionFields: Seq[String] = Nil,
                     mergeSchemas: Boolean = false,
                     updateCondition: Option[String] = None,
                     insertCondition: Option[String] = None,
                     errorOnMultiMatch: Boolean = false,
                     deleteCondition: Option[String] = None,
                     captureChanges: Boolean = false): Unit = {
    val iso = createIsolationPath(path)
    val target = if (exists(iso)) iso else path
    verboseOutput(target, "Merging", "delta")
    storage.merge(df, target, mergeCondition, partitionFields, mergeSchemas,
      updateCondition, insertCondition, errorOnMultiMatch, deleteCondition, captureChanges)
  }

  override def registerOutputObserver(observer: StorageOutputObserver): Unit =
    storage.registerOutputObserver(observer)
}
