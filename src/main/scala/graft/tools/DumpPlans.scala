package graft.tools

import org.apache.spark.scheduler.SparkListenerEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Dev-only plan dumper (guide §1/§7.2): run ONE declared query while
  * recording every SQL execution's physical-plan description and wall
  * time, written to an output dir as NNN_<ms>ms.txt — how internal
  * plans of multi-job lifecycle queries (merge, matview refresh,
  * stream batches) are captured for plans/r15 evidence without
  * touching engine code. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.DumpPlans <query> <outDir> [sfDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: DumpPlans <query> <outDir> [sfDir]"))
    val outDir = args.lift(1).getOrElse("/tmp/plans_" + name)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    case class Exec(start: Long, desc: String, plan: String)
    val open = mutable.Map[Long, Exec]()
    var seq = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case s: SparkListenerSQLExecutionStart =>
            open.synchronized {
              open(s.executionId) =
                Exec(s.time, s.description, s.physicalPlanDescription)
            }
          case u: org.apache.spark.sql.execution.ui
              .SparkListenerSQLAdaptiveExecutionUpdate =>
            // keep the LATEST adaptive re-plan: the shapes AQE actually
            // executed (SMJ->BHJ rewrites, coalesced reads), not the
            // initial estimate
            open.synchronized {
              open.get(u.executionId).foreach { x =>
                open(u.executionId) =
                  x.copy(plan = u.physicalPlanDescription)
              }
            }
          case e: SparkListenerSQLExecutionEnd =>
            open.synchronized {
              open.remove(e.executionId).foreach { x =>
                val ms = e.time - x.start
                seq += 1
                val f = Paths.get(outDir, f"$seq%03d_${ms}ms.txt")
                Files.write(f,
                  (s"== ${x.desc}\n== ${ms} ms\n\n${x.plan}\n")
                    .getBytes("UTF-8"))
              }
            }
          case _ => ()
        }
    }
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"no such query: $name"))
    try graft.SparkEntry.queries("customer_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    // warm run first so the dumped run's timings are steady-state
    fn(spark, sfDir).count()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    println(f"== $name: wall ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"rows $n, executions $seq -> $outDir")
    Thread.sleep(500)
    spark.stop()
  }
}
