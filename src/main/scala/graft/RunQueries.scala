package graft

import org.apache.spark.sql.SparkSession

/** Dev sweep main: run declared queries by name (comma-list) or all of
  * them, against a given sf dir — the fast "did the data generation /
  * environment change break anything" probe the round-6 regression
  * showed we need (34 queries silently failed when the driver
  * regenerated events.parquet with a new ts physical type; this runner
  * surfaces the per-query error in one pass).
  *
  * Usage: runMain graft.RunQueries [all|q_a,q_b,...] [sfDir]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.headOption.filterNot(_ == "all") match {
      case Some(csv) => csv.split(",").toSeq
      case None      => SparkEntry.queries.keys.toSeq.sorted
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    var fails = 0
    names.foreach { q =>
      SparkEntry.queries.get(q) match {
        case None =>
          fails += 1; println(s"FAIL $q: no such query")
        case Some(fn) =>
          try println(s"OK $q rows=${fn(spark, sfDir).count()}")
          catch {
            case e: Throwable =>
              fails += 1
              println(s"FAIL $q: ${e.getClass.getName}: " +
                String.valueOf(e.getMessage).take(300))
          }
      }
    }
    println(s"TOTAL_FAILS=$fails")
    spark.stop()
  }
}
