package graft.lineage

import java.sql.Timestamp

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.storage.{BasicStorage, StorageOutputObserver}

/** Observer that appends one lineage record per observed write:
  * (output_path, data_sources[], transform_code_file, observation_ts).
  * Reference: jorvik/data_lineage/observer.py.
  *
  * Differences: data sources come from the native plan walk ([[PlanWalk]])
  * instead of parsed explain text, and the capture timeout is a JVM
  * Future/Await instead of SIGALRM (observer.py:15-49).
  */
class DataLineageLogger(lineageLogPath: String, timeoutSeconds: Int = 300)
    extends StorageOutputObserver {

  val schema: StructType = StructType(Seq(
    StructField("output_path", StringType),
    StructField("data_sources", ArrayType(StringType)),
    StructField("transform_code_file", StringType),
    StructField("observation_ts", TimestampType)))

  /** Overridable capture step (tests swap in a hanging one). */
  protected def computeDataSources(df: DataFrame): Seq[String] =
    PlanWalk.dataSources(df)

  /** Plan capture with a timeout guard — planning a pathological query
    * can take minutes; the write itself must not hang on lineage
    * (reference: SIGALRM guard, observer.py:33-49). */
  private def getDataSources(df: DataFrame): Seq[String] =
    try Await.result(Future(computeDataSources(df)), timeoutSeconds.seconds)
    catch {
      case _: concurrent.TimeoutException =>
        Seq(s"ERROR. Unable to read dataframe execution plan. Timed out after $timeoutSeconds seconds.")
    }

  override def update(df: DataFrame, outputPath: String): Unit = {
    val spark = df.sparkSession
    val sources = getDataSources(df)
    val codeFile = CodeFile.getCodefilePath
    val row = Row(outputPath, sources, codeFile,
      new Timestamp(System.currentTimeMillis()))
    val log = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
    // Fresh observer-less storage = the reference's track_lineage=False
    // recursion guard (observer.py:95-99).
    new BasicStorage(spark).write(log, lineageLogPath, "delta", "append")
  }
}

/** Provenance: the bottom-most user frame on the stack.
  * Reference: jorvik/utils/paths.py:30-49 (JVM stack-walk analogue). */
object CodeFile {
  private val internalPrefixes = Seq(
    "java.", "jdk.", "scala.", "sbt.", "xsbt.", "org.apache.spark",
    "org.apache.hadoop", "graft.lineage.", "graft.storage.", "org.scalatest",
    "sun.")

  def getCodefilePath: String = {
    val frames = Thread.currentThread.getStackTrace.toSeq
    frames.reverse
      .find { f =>
        val cn = f.getClassName
        !internalPrefixes.exists(cn.startsWith) && f.getFileName != null
      }
      .map(f => s"${f.getFileName}:${f.getLineNumber} (${f.getClassName})")
      .getOrElse("Unknown code file path")
  }
}
