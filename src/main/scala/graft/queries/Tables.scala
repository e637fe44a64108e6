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

  /** events.parquet's `ts` physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright — read nanos as long via the legacy conf and rebuild at
    * microsecond precision) and TIMESTAMP(MICROS) without timezone
    * (which Spark reads as TIMESTAMP_NTZ). Normalize both to a session-TZ
    * TimestampType so every downstream query sees one stable type; under
    * the engine's fixed UTC session zone the NTZ→TZ cast is value-identical
    * to what DuckDB's naive-timestamp oracle reads from the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = new graft.storage.BasicStorage(spark)
      .read(s"$dir/events.parquet", "parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos read as long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => // TIMESTAMP_NTZ (or already session-TZ): one stable type
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Scaled-integer quantization of a double: floor(x·10^s + 0.5) as a
    * long. Pure double arithmetic + floor — bit-identical on Spark and
    * DuckDB. This replaces `CAST(x AS DECIMAL(p,s))`, whose
    * double→decimal rounding DuckDB does NOT perform correctly-rounded
    * (verified: Spark + exact python decimal agree, DuckDB drifts one
    * ulp on ~1-in-100k values), making decimal casts of doubles
    * unusable for cross-engine hashing. */
  def iscale(c: Column, s: Int): Column =
    floor(c * lit(math.pow(10, s).toLong) + lit(0.5)).cast("long")

  /** Exact-sum of a double column at 4 quantized decimals: integer-scale
    * each value (deterministic), sum exactly in decimal(38,0) (no
    * overflow at any scale), one double division at the end (identical
    * IEEE op both engines). */
  def dsum(c: Column): Column =
    (sum(iscale(c, 4).cast(DecimalType(38, 0))).cast("double") /
      lit(10000.0)).cast("double")

  /** Exact average: dsum divided by count — identical IEEE division. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast("double")

  /** DuckDB-side equivalents (string SQL fragments). */
  def sqlIscale(col: String, s: Int): String =
    s"CAST(floor($col * ${math.pow(10, s).toLong} + 0.5) AS BIGINT)"
  def sqlDsum(col: String): String =
    s"CAST(CAST(sum(CAST(${sqlIscale(col, 4)} AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS DOUBLE)"
  def sqlDavg(col: String): String =
    s"CAST(${sqlDsum(col)} / count($col) AS DOUBLE)"
}
