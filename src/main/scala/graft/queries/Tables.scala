package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by the declared queries.
  *
  * Determinism conventions (see SURVEY.md §7): every oracle-checked query
  * ends in a total-order sort on a unique key, selects an explicit column
  * list, and runs floating aggregates through exact decimal arithmetic
  * before casting back to double — `sum(double)` is partition-order
  * dependent, `sum(decimal)` is not, and the final decimal→double cast is
  * the same IEEE value on both Spark and DuckDB.
  */
object Tables {
  /** Load one of the driver-generated parquet tables — through the
    * engine's own storage façade, so the driver-checked queries exercise
    * the same read path a library user gets. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else new graft.storage.BasicStorage(spark).read(s"$dir/$name.parquet", "parquet")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Read nanos as long (legacy conf) and rebuild the
    * timestamp at microsecond precision — the same truncation DuckDB's
    * value-level comparisons never see because queries only emit derived
    * values (hour, date-string), never the raw timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new graft.storage.BasicStorage(spark)
      .read(s"$dir/events.parquet", "parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact-sum of a double column: decimal(18,4) accumulate → double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact average: decimal sum divided by count, in double space.
    * Both engines do the identical IEEE double division. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast("double")

  /** DuckDB-side equivalents (string SQL fragments). */
  def sqlDsum(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDavg(col: String): String =
    s"CAST(CAST(sum(CAST($col AS DECIMAL(18,4))) AS DOUBLE) / count($col) AS DOUBLE)"
}
