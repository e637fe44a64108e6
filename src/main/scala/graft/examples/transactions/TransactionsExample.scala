package graft.examples.transactions

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipelines._
import graft.storage.Storage

/** Scala port of the reference's end-to-end example pipeline
  * (examples/databricks/transactions): bronze dummy ingestion →
  * clean_transactions → customer_summary, with the same schemas, the
  * same validation rules and the same transform shapes. Parameterized
  * by a mount root + storage so tests (and isolated contexts) can
  * relocate it.
  */
object Schemas {
  /** bronze/schemas/raw_customers.py */
  val rawCustomers: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("age", IntegerType),
    StructField("city", StringType),
    StructField("registration_date", DateType)))

  /** bronze/schemas/raw_transactions.py */
  val rawTransactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("quantity", IntegerType),
    StructField("price", FloatType),
    StructField("timestamp", TimestampType)))

  /** silver/schemas/clean_transactions.py */
  val cleanTransactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("quantity", IntegerType),
    StructField("unit_price", FloatType),
    StructField("total_amount", FloatType),
    StructField("transaction_date", DateType),
    StructField("transaction_hour", IntegerType)))

  /** silver/schemas/customer_summary.py */
  val customerSummary: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_name", StringType),
    StructField("customer_city", StringType),
    StructField("total_transactions", LongType, nullable = false),
    StructField("total_spent", DoubleType),
    StructField("avg_transaction_value", DoubleType),
    StructField("first_purchase_date", DateType),
    StructField("last_purchase_date", DateType),
    StructField("customer_segment", StringType, nullable = false)))
}

/** In-memory input — the reference example defines the same ad-hoc
  * subclass (nb_ingest_raw_customers.py MemoryInput). */
case class MemoryInput(data: SparkSession => DataFrame,
                       schema: Option[StructType] = None) extends Input {
  override def extract(spark: SparkSession): DataFrame = data(spark)
}

class TransactionsExample(mnt: String, st: Storage) {
  val rawCustomersPath = s"$mnt/bronze/raw_customers/data"
  val rawTransactionsPath = s"$mnt/bronze/raw_transactions/data"
  val cleanTransactionsPath = s"$mnt/silver/clean_transactions/data"
  val customerSummaryPath = s"$mnt/silver/customer_summary/data"

  /** bronze/nb_ingest_raw_customers.py */
  val ingestCustomers: ETL = Pipelines.etl(
    inputs = Seq(MemoryInput(spark => {
      val rows = Seq(
        ("1", "John Doe", "jhon.doe@mail.com", 30, "New York"),
        ("2", "Jane Doe", "jane.doe@mail.com", 25, "Los Angeles"),
        ("3", "Mike Smith", "mike.smith@mail.com", 40, "Chicago"),
        ("4", "Sara Johnson", "sara.johnson@mail.com", 35, "Houston"),
        ("5", "Tom Brown", "tom.brown@mail.com", 28, "Miami"))
      import spark.implicits._
      rows.toDF("customer_id", "name", "email", "age", "city")
        .withColumn("registration_date",
          lit(Date.valueOf("2022-01-01")))
    }, schema = Some(Schemas.rawCustomers))),
    outputs = Seq(FileOutput(rawCustomersPath, "delta", "overwrite",
      schema = Some(Schemas.rawCustomers), storage = Some(st)))) { dfs => dfs }

  /** bronze/nb_ingest_raw_transactions.py — note rows 6 and 10 are the
    * deliberately-invalid ones (negative quantity / price). */
  val ingestTransactions: ETL = Pipelines.etl(
    inputs = Seq(MemoryInput(spark => {
      val rows = Seq(
        ("1", "1", "1", 1, 11.0f, "2022-01-01 00:00:00"),
        ("2", "1", "2", 1, 12.0f, "2022-01-02 00:00:00"),
        ("3", "1", "3", 2, 13.0f, "2022-01-03 00:00:00"),
        ("4", "1", "4", 1, 14.0f, "2022-01-04 00:00:00"),
        ("5", "2", "1", 3, 11.0f, "2022-01-05 00:00:00"),
        ("6", "2", "1", -1, 11.0f, "2022-01-06 00:00:00"),
        ("7", "2", "1", 1, 11.0f, "2022-01-07 00:00:00"),
        ("8", "3", "2", 2, 12.0f, "2022-01-08 00:00:00"),
        ("9", "3", "2", 2, 12.0f, "2022-01-09 00:00:00"),
        ("10", "3", "2", 1, -12.0f, "2022-01-10 00:00:00"),
        ("11", "4", "4", 1, 14.0f, "2022-01-11 00:00:00"))
      import spark.implicits._
      rows.toDF("transaction_id", "customer_id", "product_id", "quantity",
          "price", "ts")
        .withColumn("timestamp", col("ts").cast(TimestampType)).drop("ts")
    }, schema = Some(Schemas.rawTransactions))),
    outputs = Seq(FileOutput(rawTransactionsPath, "delta", "overwrite",
      schema = Some(Schemas.rawTransactions), storage = Some(st)))) { dfs => dfs }

  /** silver/nb_clean_transactions.py */
  val cleanTransactions: ETL = Pipelines.etl(
    inputs = Seq(FileInput(rawTransactionsPath, "delta",
      schema = Some(Schemas.rawTransactions), storage = Some(st))),
    outputs = Seq(FileOutput(cleanTransactionsPath, "delta", "overwrite",
      schema = Some(Schemas.cleanTransactions), storage = Some(st)))) {
    case Seq(raw) => Seq(
      raw.filter("quantity > 0")
        .filter("price > 0")
        .withColumn("total_amount",
          (col("quantity") * col("price")).cast("float"))
        .withColumn("transaction_date", to_date(col("timestamp")))
        .withColumn("transaction_hour", hour(col("timestamp")))
        .withColumn("unit_price", col("price"))
        .select("transaction_id", "customer_id", "product_id",
          "quantity", "unit_price", "total_amount",
          "transaction_date", "transaction_hour"))
  }

  // silver/nb_create_customer_summary.py — the three named transforms
  private def calculateStatisticsPerCustomer(transactions: DataFrame): DataFrame =
    transactions.groupBy("customer_id").agg(
      count("transaction_id").as("total_transactions"),
      sum("total_amount").as("total_spent"),
      avg("total_amount").as("avg_transaction_value"),
      min("transaction_date").as("first_purchase_date"),
      max("transaction_date").as("last_purchase_date"))

  private def createSegments(customersWithStatistics: DataFrame): DataFrame =
    customersWithStatistics.withColumn("customer_segment",
      when(col("total_spent") >= 1000, "High Value")
        .when(col("total_spent") >= 500, "Medium Value")
        .otherwise("Low Value"))

  private def projectRelevantColumns(customersWithStatistics: DataFrame): DataFrame =
    customersWithStatistics.select("customer_id", "name", "city",
        "total_transactions", "total_spent", "avg_transaction_value",
        "first_purchase_date", "last_purchase_date", "customer_segment")
      .withColumnRenamed("name", "customer_name")
      .withColumnRenamed("city", "customer_city")

  val createCustomerSummary: ETL = Pipelines.etl(
    inputs = Seq(
      FileInput(rawCustomersPath, "delta",
        schema = Some(Schemas.rawCustomers), storage = Some(st)),
      FileInput(cleanTransactionsPath, "delta",
        schema = Some(Schemas.cleanTransactions), storage = Some(st))),
    outputs = Seq(FileOutput(customerSummaryPath, "delta", "overwrite",
      schema = Some(Schemas.customerSummary), storage = Some(st)))) {
    case Seq(customers, transactions) => Seq(
      calculateStatisticsPerCustomer(transactions)
        .join(customers, Seq("customer_id"), "left")
        .transform(createSegments)
        .transform(projectRelevantColumns))
  }

  /** Run the whole medallion flow. */
  def runAll(spark: SparkSession): Unit = {
    ingestCustomers.run(spark)
    ingestTransactions.run(spark)
    cleanTransactions.run(spark)
    createCustomerSummary.run(spark)
  }
}
