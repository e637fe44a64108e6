package graft.examples

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.examples.transactions.TransactionsExample
import graft.pipelines.Pipelines
import graft.storage.BasicStorage

/** End-to-end run of the ported reference example (bronze → silver
  * medallion flow) + the reference's per-notebook schema smoke tests
  * (examples/databricks/transactions/tests). */
class TransactionsExampleSpec extends AnyFunSuite with SparkSpec {

  private lazy val mnt = tempDir("transactions_example")
  private lazy val example =
    new TransactionsExample(mnt, new BasicStorage(spark))

  test("schema smoke tests (reference tests/ ports)") {
    Pipelines.smokeTestEtl(spark, example.ingestCustomers)
    Pipelines.smokeTestEtl(spark, example.ingestTransactions)
    Pipelines.smokeTestEtl(spark, example.cleanTransactions)
    Pipelines.smokeTestEtl(spark, example.createCustomerSummary)
  }

  test("full medallion flow produces the expected customer summary") {
    example.runAll(spark)
    val st = new BasicStorage(spark)

    val clean = st.read(example.cleanTransactionsPath, "delta")
    // rows 6 (negative quantity) and 10 (negative price) filtered out
    assert(clean.count() == 9)
    assert(clean.filter(col("quantity") < 0 || col("unit_price") < 0).count() == 0)

    val summary = st.read(example.customerSummaryPath, "delta")
      .orderBy("customer_id").collect()
    assert(summary.length == 4) // customer 5 has no transactions

    val byId = summary.map(r => r.getAs[String]("customer_id") -> r).toMap
    // customer 1: 4 txns, 11+12+26+14 = 63.0
    assert(byId("1").getAs[Long]("total_transactions") == 4)
    assert(math.abs(byId("1").getAs[Double]("total_spent") - 63.0) < 1e-6)
    assert(byId("1").getAs[String]("customer_name") == "John Doe")
    assert(byId("1").getAs[String]("customer_segment") == "Low Value")
    // customer 2: txns 5 and 7 → 33 + 11 = 44.0
    assert(byId("2").getAs[Long]("total_transactions") == 2)
    assert(math.abs(byId("2").getAs[Double]("total_spent") - 44.0) < 1e-6)
    // customer 3: txns 8, 9 → 24 + 24 = 48.0
    assert(byId("3").getAs[Long]("total_transactions") == 2)
    // customer 4: txn 11 → 14.0
    assert(byId("4").getAs[Long]("total_transactions") == 1)
    assert(byId("4").getAs[java.sql.Date]("first_purchase_date").toString ==
      "2022-01-11")
  }
}
