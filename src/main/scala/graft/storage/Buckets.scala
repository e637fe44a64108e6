package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout: pre-shuffle data into a fixed number of
  * buckets on the join/aggregation key at write time, so later
  * equi-joins and aggregations on that key skip their shuffle entirely
  * (Catalyst sees both sides hash-partitioned identically). The
  * co-location primitive for repeated fact-fact joins at 100 TB — pay
  * the shuffle once at layout time, never per query.
  *
  * Bucketed tables go through the session catalog (`saveAsTable`);
  * path-addressed writes cannot carry bucket metadata.
  */
object Buckets {

  /** Create (once) a database whose tables live under `location` —
    * keeps bucketed artifacts out of the default warehouse. The
    * location binds at first creation; later calls reuse it. */
  def ensureDatabase(spark: SparkSession, db: String,
                     location: String): Unit =
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$location'")

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil,
                    format: String = "parquet"): Unit = {
    var writer = df.write.format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty)
      writer = writer.sortBy(sortCols.head, sortCols.tail: _*)
    writer.mode(SaveMode.Overwrite).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
