package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-benchmark of the op-log IO path (guide §1). */
object LogBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("logbench").toString + "/t"
    def time[A](n: String)(b: => A): A = {
      val t = System.nanoTime(); val r = b
      println(f"${(System.nanoTime() - t) / 1e6}%8.1f ms  $n"); r
    }
    time("append 1")(graft.storage.GraftLog.append(spark, dir, "WRITE", Seq("p")))
    time("append 2")(graft.storage.GraftLog.append(spark, dir, "MERGE"))
    time("append 3")(graft.storage.GraftLog.append(spark, dir, "DELETE"))
    (1 to 7).foreach(i => graft.storage.GraftLog.append(spark, dir, s"OP$i"))
    time("records x1")(graft.storage.GraftLog.records(spark, dir))
    time("records x2")(graft.storage.GraftLog.records(spark, dir))
    time("records x3")(graft.storage.GraftLog.records(spark, dir))
    time("history+collect")(graft.storage.GraftLog.history(spark, dir).collect())
    time("snapshot")(graft.storage.Txn.snapshot(spark, dir))
    time("snapshot2")(graft.storage.Txn.snapshot(spark, dir))
    spark.stop()
  }
}
