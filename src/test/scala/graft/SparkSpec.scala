package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Schemas

/** Shared local SparkSession + small-data equality helpers for suites. */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** assertDataFrameEqual analogue: schema (order/null-insensitive) +
    * row multiset equality. Small data only — collects. */
  def assertDfEqual(actual: DataFrame, expected: DataFrame): Unit = {
    assert(Schemas.areEqual(actual.schema, expected.schema),
      s"schemas differ:\n  actual:   ${actual.schema.simpleString}\n  expected: ${expected.schema.simpleString}")
    val cols = expected.schema.fieldNames.toSeq
    val a = actual.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted.toSeq
    val e = expected.select(cols.head, cols.tail: _*).collect()
      .map(_.toString).sorted.toSeq
    assert(a == e, s"rows differ:\n  actual:   $a\n  expected: $e")
  }

  def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}
