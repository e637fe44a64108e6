package graft.storage

import java.nio.file.Files

import scala.sys.process._
import scala.util.Try

import org.apache.spark.sql.SparkSession

/** Isolation-context providers.
  * Reference: jorvik/storage/isolation_providers.py + jorvik/utils/git.py.
  * Config keys and the environment variable are kept identical so a
  * reference user's configuration carries over unchanged. */
object IsolationProviders {

  type Provider = () => String

  val EnvVar = "JORVIK_ISOLATION_CONTEXT"

  /** Session conf beats context conf (isolation_providers.py:27-44). */
  def getSparkConfig(spark: SparkSession, key: String,
                     default: Option[String] = None): String =
    spark.conf.getOption(key)
      .orElse(Option(spark.sparkContext.getConf.get(key, null)))
      .orElse(default)
      .getOrElse(throw new IllegalArgumentException(
        s"Configuration key '$key' not found in either Spark session or Spark context."))

  val noIsolation: Provider = () => ""

  val environmentVariable: Provider = () =>
    sys.env.getOrElse(EnvVar, throw new IllegalArgumentException(
      s"Environment variable '$EnvVar' is not set."))

  def sparkConfig(spark: SparkSession): Provider = () =>
    getSparkConfig(spark, "io.jorvik.storage.isolation_context")

  /** `git branch --show-current` from the working directory
    * (jorvik/utils/git.py:12-48). */
  val gitBranch: Provider = () =>
    Try(Process(Seq("git", "branch", "--show-current")).!!.trim).getOrElse {
      throw new IllegalStateException(
        "Not in a Git repository; git client not installed or unable to determine the current branch.")
    }

  private def databricksStub(what: String): Provider = () =>
    throw new UnsupportedOperationException(
      s"$what requires a Databricks runtime, which is not available in this " +
        "environment. Use one of the runtime-independent providers instead: " +
        "GIT_BRANCH (current git branch), ENVIRONMENT_VARIABLE " +
        s"(reads $EnvVar), or SPARK_CONFIG (reads " +
        "io.jorvik.storage.isolation_context).")

  /** Context must be usable as a directory name — probe with a real mkdir
    * in a temp dir (isolation_providers.py:9-25). */
  def validateIsolationContext(context: String): Unit = {
    val ok = Try {
      val tmp = Files.createTempDirectory("graft_ctx_probe")
      try Files.createDirectory(tmp.resolve(context))
      finally {
        Try(Files.deleteIfExists(tmp.resolve(context)))
        Try(Files.deleteIfExists(tmp))
      }
    }.isSuccess
    if (!ok) throw new IllegalArgumentException(
      s"Invalid isolation context name $context. This name is not accepted as a directory in the filesystem.")
  }

  /** Resolve the provider named by `io.jorvik.storage.isolation_provider`
    * (default NO_ISOLATION) and validate its context
    * (isolation_providers.py:75-99). */
  def getIsolationProvider(spark: SparkSession): Provider = {
    val name = getSparkConfig(spark, "io.jorvik.storage.isolation_provider",
      Some("NO_ISOLATION"))
    val providers: Map[String, Provider] = Map(
      "NO_ISOLATION" -> noIsolation,
      "DATABRICKS_GIT_BRANCH" -> databricksStub("DATABRICKS_GIT_BRANCH"),
      "DATABRICKS_USER" -> databricksStub("DATABRICKS_USER"),
      "DATABRICKS_CLUSTER" -> databricksStub("DATABRICKS_CLUSTER"),
      "GIT_BRANCH" -> gitBranch,
      "ENVIRONMENT_VARIABLE" -> environmentVariable,
      "SPARK_CONFIG" -> sparkConfig(spark))
    val provider = providers.getOrElse(name,
      throw new IllegalArgumentException(
        s"Unknown isolation provider: $name. Supported providers are: ${providers.keys.mkString(", ")}."))
    if (name != "NO_ISOLATION") validateIsolationContext(provider())
    provider
  }
}
