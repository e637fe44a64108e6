package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** The declared query inventory (SURVEY.md §2 [Q] rows).
  *
  * Each entry has a Spark definition and (where SQL-expressible) a DuckDB
  * oracle in [[oracles]] producing the identical schema + total row order.
  */
object GraftQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship: the reference's showcase shape — groupBy-agg → left join →
    * CASE segmentation (reference: examples/databricks/transactions/silver/
    * nb_create_customer_summary.py:25-64), re-expressed on the TPC-H-ish
    * tables. Aggregate per customer over orders, left-join customer dims,
    * segment by total spend. */
  val customerSummary: Q = (spark, dir) => {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val agg = orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("order_count"),
        dsum(col("o_totalprice")).as("total_spent"),
        davg(col("o_totalprice")).as("avg_spent"),
        min(col("o_totalprice")).as("min_order"),
        max(col("o_totalprice")).as("max_order")
      )
    agg
      .join(customer, col("o_custkey") === col("c_custkey"), "left")
      .withColumn(
        "segment",
        when(col("total_spent") >= 1500000, "High Value")
          .when(col("total_spent") >= 500000, "Medium Value")
          .otherwise("Low Value"))
      .select("o_custkey", "c_name", "c_mktsegment", "order_count",
        "total_spent", "avg_spent", "min_order", "max_order", "segment")
      .orderBy("o_custkey")
  }

  val customerSummarySql: String =
    s"""SELECT o_custkey, c_name, c_mktsegment,
       |  count(*) AS order_count,
       |  ${sqlDsum("o_totalprice")} AS total_spent,
       |  ${sqlDavg("o_totalprice")} AS avg_spent,
       |  min(o_totalprice) AS min_order,
       |  max(o_totalprice) AS max_order,
       |  CASE WHEN ${sqlDsum("o_totalprice")} >= 1500000 THEN 'High Value'
       |       WHEN ${sqlDsum("o_totalprice")} >= 500000 THEN 'Medium Value'
       |       ELSE 'Low Value' END AS segment
       |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
       |GROUP BY o_custkey, c_name, c_mktsegment
       |ORDER BY o_custkey""".stripMargin

  /** name → (spark query, optional oracle SQL) */
  def all: Map[String, (Q, Option[String])] = Map(
    "customer_summary" -> (customerSummary, Some(customerSummarySql))
  )
}
