package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke main mirroring the driver's t1 check: entry(spark) rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
