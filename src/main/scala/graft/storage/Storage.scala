package graft.storage

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.DataFrame

/** Observer notified whenever a DataFrame is written to a path.
  * Reference: jorvik/storage/protocols.py:6-13. */
trait StorageOutputObserver {
  def update(df: DataFrame, outputPath: String): Unit
}

/** The storage façade contract. Reference: jorvik/storage/protocols.py:16-130.
  *
  * Formats: delta, parquet, json, csv, orc. In this engine `delta` is a
  * parquet-backed managed table (no Delta Lake jar in the environment): the
  * data is plain parquet plus a `_graft_log` sidecar directory recording
  * (operation, timestamp) per write — underscore-prefixed, so Spark's and
  * DuckDB's parquet readers ignore it.
  */
trait Storage {
  def read(path: String, format: String,
           options: Map[String, String] = Map.empty): DataFrame
  def readStream(path: String, format: String,
                 options: Map[String, String] = Map.empty): DataFrame
  def write(df: DataFrame, path: String, format: String, mode: String,
            partitionFields: Seq[String] = Nil,
            options: Map[String, String] = Map.empty): Unit
  def writeStream(df: DataFrame, path: String, format: String, checkpoint: String,
                  partitionFields: Seq[String] = Nil,
                  options: Map[String, String] = Map.empty): StreamingQuery
  def merge(df: DataFrame, path: String, mergeCondition: String,
            partitionFields: Seq[String] = Nil,
            mergeSchemas: Boolean = false,
            updateCondition: Option[String] = None,
            insertCondition: Option[String] = None,
            errorOnMultiMatch: Boolean = false,
            deleteCondition: Option[String] = None,
            captureChanges: Boolean = false): Unit
  def exists(path: String): Boolean
  def registerOutputObserver(observer: StorageOutputObserver): Unit
}
