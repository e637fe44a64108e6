package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.core.{Expectations, Schemas}
import graft.storage.{GraftStorage, Storage}

/** Typed ETL framework: Input/Output bindings (path + format + schema) and
  * an extract → validate → transform → validate → load runner.
  * Reference: jorvik/pipelines/etl.py.
  */
trait Input {
  def schema: Option[StructType]
  def extract(spark: SparkSession): DataFrame
  protected def warnIfSchemaless(): Unit =
    if (schema.isEmpty) Console.err.println(
      "WARNING: Missing schema definition. Specifying a schema increases a jobs cohesion and robustness.")
}

trait Output {
  def schema: Option[StructType]
  def load(spark: SparkSession, df: DataFrame): Unit
}

/** Batch bindings may carry value-level [[graft.core.Expectations]]
  * rules, checked by the runner at the same boundaries as the schema
  * validation (extract → check-in, transform → check-out) — the
  * reference validates SHAPE there (`etl.py:189-211`); rules validate
  * VALUES. One extra aggregation job per ruled frame. Streaming
  * bindings don't carry rules (an aggregation gate has no meaning
  * mid-stream — gate the batch source instead). */
trait ValueChecked {
  def expectations: Seq[Expectations.Rule]
}

/** Batch file input (etl.py:34-52). */
case class FileInput(path: String, format: String,
                     options: Map[String, String] = Map.empty,
                     schema: Option[StructType] = None,
                     storage: Option[Storage] = None,
                     expectations: Seq[Expectations.Rule] = Nil)
    extends Input with ValueChecked {
  warnIfSchemaless()
  override def extract(spark: SparkSession): DataFrame =
    storage.getOrElse(GraftStorage.configure(spark)).read(path, format, options)
}

/** Streaming file input (etl.py:55-73). */
case class StreamFileInput(path: String, format: String,
                           options: Map[String, String] = Map.empty,
                           schema: Option[StructType] = None,
                           storage: Option[Storage] = None) extends Input {
  warnIfSchemaless()
  override def extract(spark: SparkSession): DataFrame =
    storage.getOrElse(GraftStorage.configure(spark))
      .readStream(path, format, options)
}

/** Batch file output (etl.py:76-97). */
case class FileOutput(path: String, format: String, mode: String,
                      partitionFields: Seq[String] = Nil,
                      options: Map[String, String] = Map.empty,
                      schema: Option[StructType] = None,
                      storage: Option[Storage] = None,
                      expectations: Seq[Expectations.Rule] = Nil)
    extends Output with ValueChecked {
  override def load(spark: SparkSession, df: DataFrame): Unit =
    storage.getOrElse(GraftStorage.configure(spark))
      .write(df, path, format, mode, partitionFields, options)
}

/** Merge upsert output (etl.py:100-121; the reference's positional-arg slip
  * passing merge_schemas as partition_fields is fixed by named params). */
case class MergeOutput(path: String, mergeCondition: String,
                       mergeSchemas: Boolean = false,
                       updateCondition: Option[String] = None,
                       insertCondition: Option[String] = None,
                       partitionFields: Seq[String] = Nil,
                       schema: Option[StructType] = None,
                       storage: Option[Storage] = None,
                       expectations: Seq[Expectations.Rule] = Nil)
    extends Output with ValueChecked {
  override def load(spark: SparkSession, df: DataFrame): Unit =
    storage.getOrElse(GraftStorage.configure(spark))
      .merge(df, path, mergeCondition, partitionFields, mergeSchemas,
        updateCondition, insertCondition)
}

/** Streaming file output (etl.py:124-143). Keeps the handle of the last
  * started query so callers can drain it in tests. */
case class StreamFileOutput(path: String, format: String, checkpoint: String,
                            partitionFields: Seq[String] = Nil,
                            options: Map[String, String] = Map.empty,
                            schema: Option[StructType] = None,
                            storage: Option[Storage] = None) extends Output {
  @volatile var lastQuery: Option[StreamingQuery] = None
  override def load(spark: SparkSession, df: DataFrame): Unit =
    lastQuery = Some(storage.getOrElse(GraftStorage.configure(spark))
      .writeStream(df, path, format, checkpoint, partitionFields, options))
}

/** The runner (etl.py:145-211). */
class ETL(val inputs: Seq[Input], val outputs: Seq[Output],
          val transformFunc: Seq[DataFrame] => Seq[DataFrame],
          val validateSchemas: Boolean = true) {

  def apply(spark: SparkSession): Unit = run(spark)

  def extract(spark: SparkSession): Seq[DataFrame] =
    inputs.map(_.extract(spark))

  def load(spark: SparkSession, transformed: Seq[DataFrame]): Unit = {
    if (transformed.length != outputs.length)
      throw new RuntimeException(
        "Number of transformed dataframes must match number of outputs")
    transformed.zip(outputs).foreach { case (df, out) => out.load(spark, df) }
  }

  def run(spark: SparkSession): Unit = {
    val data = extract(spark)
    if (validateSchemas) verifyInputSchemas(data)
    verifyExpectations(inputs.zip(data), "Input")
    val transformed = transformFunc(data)
    if (validateSchemas) verifyOutputSchemas(transformed)
    verifyExpectations(outputs.zip(transformed), "Output")
    load(spark, transformed)
  }

  /** Value-rule gate at the same boundaries as the schema checks:
    * batch bindings carrying [[graft.core.Expectations]] rules fail
    * the run with per-rule violation counts. Streaming frames are
    * skipped (no mid-stream aggregation gate). */
  private def verifyExpectations(bound: Seq[(Any, DataFrame)],
                                 side: String): Unit =
    bound.foreach {
      case (b: ValueChecked, df)
          if b.expectations.nonEmpty && !df.isStreaming =>
        val broken = Expectations.check(df, b.expectations)
          .filter(org.apache.spark.sql.functions.col("violations") > 0)
          .collect()
        if (broken.nonEmpty) throw new RuntimeException(
          s"$side expectations did not match: " + broken.map(r =>
            s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
      case _ => ()
    }

  /** Declared input schema must be a subset of the extracted schema. */
  def verifyInputSchemas(data: Seq[DataFrame]): Unit =
    inputs.zip(data).foreach { case (in, df) =>
      val schema = in.schema.getOrElse(throw new RuntimeException(
        "No schema defined for input and the validateSchemas parameter is set to true." +
          " To suppress this set the validateSchemas parameter to false."))
      if (!Schemas.isSubset(schema, df.schema))
        throw new RuntimeException(
          "Input schema did not match expectations" +
            s"\nexpected: \n${schema.fields.mkString("\n")}" +
            s"\n\nactual: \n${df.schema.fields.mkString("\n")}")
    }

  /** Transformed schema must equal the declared output schema. */
  def verifyOutputSchemas(data: Seq[DataFrame]): Unit =
    outputs.zip(data).foreach { case (out, df) =>
      val schema = out.schema.getOrElse(throw new RuntimeException(
        "No schema defined for output and the validateSchemas parameter is set to true." +
          " To suppress this set the validateSchemas parameter to false."))
      if (!Schemas.areEqual(schema, df.schema))
        throw new RuntimeException(
          "Output schema did not match expectations" +
            s"\nexpected: \n${schema.fields.mkString("\n")}" +
            s"\n\nactual: \n${df.schema.fields.mkString("\n")}")
    }
}

object Pipelines {
  /** The `@etl` decorator as a curried builder (etl.py:213-217):
    * `etl(inputs, outputs)(dfs => ...)`. */
  def etl(inputs: Seq[Input], outputs: Seq[Output],
          validateSchemas: Boolean = true)(
          transform: Seq[DataFrame] => Seq[DataFrame]): ETL =
    new ETL(inputs, outputs, transform, validateSchemas)

  /** Schema smoke test: run the transform on empty frames built from the
    * declared input schemas, assert output schema equality
    * (jorvik/pipelines/testing.py:22-33). */
  def smokeTestEtl(spark: SparkSession, etl: ETL): Unit = {
    val data = etl.inputs.map { in =>
      val schema = in.schema.getOrElse(throw new RuntimeException(
        s"smokeTestEtl requires schemas on all inputs"))
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }
    val transformed = etl.transformFunc(data)
    transformed.zip(etl.outputs).foreach { case (df, out) =>
      val schema = out.schema.getOrElse(throw new RuntimeException(
        s"smokeTestEtl requires schemas on all outputs"))
      if (!Schemas.areEqual(df.schema, schema))
        throw new AssertionError(
          s"Schema mismatch:\n  transformed: ${df.schema.simpleString}\n  declared:    ${schema.simpleString}")
    }
  }
}
