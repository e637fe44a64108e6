package graft.tools

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dev-only: write `explain("formatted")` of each named declared
  * query's RETURNED frame to `<outDir>/<query>_<tag>.txt` — the
  * plans/r15 evidence files. Lifecycle queries run their side effects
  * while building the frame; the explain is of the final read. For
  * internal plans (merge/refresh/stream batches) see [[DumpPlans]].
  *
  * Usage: runMain graft.tools.ExplainDump <tag> <outDir> <q1,q2,...> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"no such query: $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote ${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
