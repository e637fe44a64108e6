package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.storage.BasicStorage

/** Ports of test/pipelines/test_etl.py + test_testing.py over the
  * fixtures in test/fixtures/pipelines.py. */
class PipelinesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  private val firstSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("value", StringType)))
  private val secondSchema = StructType(Seq(
    StructField("id", LongType), StructField("another_name", StringType),
    StructField("another_value", StringType)))
  private val outSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("value", StringType), StructField("another_name", StringType),
    StructField("another_value", StringType)))

  private def firstDf =
    Seq((1L, "Alice", "1.0"), (2L, "Bob", "2.0"), (3L, "Cathy", "3.0"))
      .toDF("id", "name", "value")
  private def secondDf =
    Seq((1L, "Another Alice", "1.0"), (2L, "Another Bob", "2.0"),
      (3L, "Another Cathy", "3.0")).toDF("id", "another_name", "another_value")

  private def seed(base: String): Unit = {
    st.write(firstDf, s"$base/first", "delta", "overwrite")
    st.write(secondDf, s"$base/second", "delta", "overwrite")
  }

  private def simpleJoin(base: String, outSch: Option[StructType],
                         inSch: Option[StructType] = Some(firstSchema),
                         inSch2: Option[StructType] = Some(secondSchema),
                         validate: Boolean = true): ETL =
    Pipelines.etl(
      inputs = Seq(
        FileInput(s"$base/first", "delta", schema = inSch, storage = Some(st)),
        FileInput(s"$base/second", "delta", schema = inSch2, storage = Some(st))),
      outputs = Seq(
        FileOutput(s"$base/out", "delta", "overwrite", schema = outSch,
          storage = Some(st))),
      validateSchemas = validate) {
      case Seq(first, second) => Seq(first.join(second, Seq("id"), "inner"))
    }

  test("etl runs successfully with schemas (test_etl_runs_success)") {
    val base = tempDir("etl1")
    seed(base)
    simpleJoin(base, Some(outSchema)).run(spark)
    val result = st.read(s"$base/out", "delta")
    assertDfEqual(result, firstDf.join(secondDf, Seq("id"), "inner"))
  }

  test("etl without schemas runs when validation off") {
    val base = tempDir("etl2")
    seed(base)
    simpleJoin(base, None, None, None, validate = false).run(spark)
    assertDfEqual(st.read(s"$base/out", "delta"),
      firstDf.join(secondDf, Seq("id"), "inner"))
  }

  test("incorrect output schema fails the run") {
    val base = tempDir("etl3")
    seed(base)
    val badOut = StructType(Seq(
      StructField("column1", StringType), StructField("column2", StringType)))
    intercept[RuntimeException] { simpleJoin(base, Some(badOut)).run(spark) }
  }

  test("incorrect schema passes when validation is skipped") {
    val base = tempDir("etl4")
    seed(base)
    val badOut = StructType(Seq(
      StructField("column1", StringType), StructField("column2", StringType)))
    simpleJoin(base, Some(badOut), validate = false).run(spark)
  }

  test("missing schema with validation on is an error") {
    val base = tempDir("etl5")
    seed(base)
    intercept[RuntimeException] { simpleJoin(base, Some(outSchema), inSch = None).run(spark) }
  }

  test("input expectations gate the run with per-rule counts") {
    import graft.core.Expectations._
    val base = tempDir("etl_exp")
    seed(base)
    val job = Pipelines.etl(
      inputs = Seq(FileInput(s"$base/first", "delta",
        schema = Some(firstSchema),
        expectations = Seq(NotNull("id"), Unique(Seq("id")),
          OneOf("name", Seq("Alice", "Bob"))))), // Cathy violates
      outputs = Seq(FileOutput(s"$base/out", "delta", "overwrite",
        schema = Some(firstSchema)))) { dfs => dfs }
    val e = intercept[RuntimeException] { job.run(spark) }
    assert(e.getMessage.contains("Input expectations did not match"))
    assert(e.getMessage.contains("one_of(name)=1"), e.getMessage)
  }

  test("output expectations catch a transform bug before the load") {
    import graft.core.Expectations._
    val base = tempDir("etl_expo")
    seed(base)
    val out = FileOutput(s"$base/out", "delta", "overwrite",
      schema = Some(firstSchema),
      expectations = Seq(Satisfies("value_positive",
        "CAST(value AS DOUBLE) > 0")))
    val bad = Pipelines.etl(
      inputs = Seq(FileInput(s"$base/first", "delta",
        schema = Some(firstSchema))),
      outputs = Seq(out)) { case Seq(df) =>
      Seq(df.withColumn("value", // the planted bug: negates values
        (-col("value").cast("double")).cast("string")))
    }
    val e = intercept[RuntimeException] { bad.run(spark) }
    assert(e.getMessage.contains("Output expectations did not match"))
    assert(e.getMessage.contains("satisfies(value_positive)=3"))
    assert(!graft.storage.Fs.exists(spark, s"$base/out"),
      "nothing must be loaded after a failed gate")
    // the clean transform passes the same gate
    Pipelines.etl(
      inputs = Seq(FileInput(s"$base/first", "delta",
        schema = Some(firstSchema))),
      outputs = Seq(out)) { dfs => dfs }.run(spark)
    assertDfEqual(st.read(s"$base/out", "delta"), firstDf)
  }

  test("etl with merge output (test_etl_with_merge)") {
    val base = tempDir("etl_merge")
    val df = Seq((1L, "existing"), (2L, "existing"), (3L, "existing"))
      .toDF("id", "value")
    st.write(df, s"$base/in_df", "delta", "overwrite")
    st.write(df, s"$base/out", "delta", "overwrite")
    val pipeline = Pipelines.etl(
      inputs = Seq(FileInput(s"$base/in_df", "delta", storage = Some(st))),
      outputs = Seq(MergeOutput(s"$base/out", "full.id = incremental.id",
        storage = Some(st))),
      validateSchemas = false) { case Seq(d) =>
      Seq(d.unionByName(Seq((4L, "added")).toDF("id", "value"))
        .withColumn("value", when(col("id") === 3, "updated").otherwise(col("value")))
        .filter("id != 1"))
    }
    pipeline.run(spark)
    val expected = Seq((1L, "existing"), (2L, "existing"), (3L, "updated"),
      (4L, "added")).toDF("id", "value")
    assertDfEqual(st.read(s"$base/out", "delta"), expected)
  }

  test("arity mismatch between transforms and outputs") {
    val base = tempDir("etl6")
    seed(base)
    val bad = Pipelines.etl(
      inputs = Seq(FileInput(s"$base/first", "delta", storage = Some(st))),
      outputs = Seq(
        FileOutput(s"$base/out", "delta", "overwrite", storage = Some(st)),
        FileOutput(s"$base/out2", "delta", "overwrite", storage = Some(st))),
      validateSchemas = false) { dfs => dfs }
    intercept[RuntimeException] { bad.run(spark) }
  }

  test("multi-output etl: one transform feeding two sinks") {
    val base = tempDir("etl_multi")
    seed(base)
    val pipeline = Pipelines.etl(
      inputs = Seq(FileInput(s"$base/first", "delta", storage = Some(st))),
      outputs = Seq(
        FileOutput(s"$base/out_hi", "parquet", "overwrite", storage = Some(st)),
        FileOutput(s"$base/out_lo", "parquet", "overwrite", storage = Some(st))),
      validateSchemas = false) { case Seq(d) =>
      Seq(d.filter(col("id") <= 1), d.filter(col("id") > 1))
    }
    pipeline.run(spark)
    assert(st.read(s"$base/out_hi", "parquet").count() == 1)
    assert(st.read(s"$base/out_lo", "parquet").count() == 2)
  }

  test("streaming etl end-to-end (StreamFileInput -> StreamFileOutput)") {
    val base = tempDir("etl_stream")
    st.write(firstDf, s"$base/in", "parquet", "overwrite")
    val out = StreamFileOutput(s"$base/out", "parquet", s"$base/cp",
      storage = Some(st))
    val pipeline = Pipelines.etl(
      inputs = Seq(StreamFileInput(s"$base/in", "parquet", storage = Some(st))),
      outputs = Seq(out), validateSchemas = false) { dfs => dfs }
    pipeline.run(spark)
    val q = out.lastQuery.get
    q.processAllAvailable()
    q.stop()
    assertDfEqual(st.read(s"$base/out", "parquet"), firstDf)
  }

  test("smokeTestEtl validates transform schemas on empty frames") {
    val base = tempDir("etl_smoke")
    Pipelines.smokeTestEtl(spark, simpleJoin(base, Some(outSchema)))
    val badOut = StructType(Seq(StructField("nope", StringType)))
    intercept[AssertionError] {
      Pipelines.smokeTestEtl(spark, simpleJoin(base, Some(badOut)))
    }
  }

  test("transform composition via df.transform (reference nb pattern)") {
    def addTotal(df: DataFrame): DataFrame =
      df.withColumn("total", col("id") * 2)
    val composed = firstDf.transform(addTotal)
    assert(composed.columns.contains("total"))
  }
}
