package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only profiling main (guide §1: measure first): run ONE declared
  * query under a listener that records every Spark job's callsite and
  * wall time, then print the per-callsite totals sorted by cost — the
  * fastest way to see which PHASE of a multi-job lifecycle query
  * (managed writes, merges, matview refreshes, stream drains) owns the
  * seconds. Not part of the driver contract; local[32] like the bench.
  *
  * Usage: runMain graft.tools.ProfileQuery <query> [sfDir] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ProfileQuery <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Rec(var n: Int = 0, var ms: Long = 0L)
    val byCallsite = mutable.LinkedHashMap[String, Rec]()
    val jobStart = mutable.Map[Int, (Long, String)]()
    var nJobs = 0
    var lastJobEnd = 0L
    var gapMs = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the result stage's name carries the action's callsite; AQE
        // final-stage jobs surface as CompletableFuture lambdas — fall
        // back to any stage in the job that names a repo source line
        val names = js.stageInfos.map(_.name)
        val site = names.reverse
          .find(n => n.contains(".scala") && !n.contains("CompletableFuture"))
          .orElse(names.lastOption).getOrElse("unknown")
        jobStart.synchronized {
          if (lastJobEnd > 0 && js.time > lastJobEnd)
            gapMs += js.time - lastJobEnd
          jobStart(js.jobId) = (js.time, site)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.synchronized {
          lastJobEnd = math.max(lastJobEnd, je.time)
          jobStart.remove(je.jobId).foreach { case (t0, site) =>
            val r = byCallsite.getOrElseUpdate(site, Rec())
            r.n += 1
            r.ms += (je.time - t0)
            nJobs += 1
          }
        }
    }
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"no such query: $name"))
    // warmup parity with the bench
    try graft.SparkEntry.queries("customer_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      byCallsite.clear(); nJobs = 0; lastJobEnd = 0L; gapMs = 0L
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the queue a beat to drain
      Thread.sleep(300)
      println(f"== $name rep $rep: wall $wall%.2f s, rows $n, jobs $nJobs")
      val rows = byCallsite.toSeq.sortBy(-_._2.ms)
      val totalMs = rows.map(_._2.ms).sum
      println(f"   sum(job wall) ${totalMs / 1e3}%.2f s; between-jobs gap ${gapMs / 1e3}%.2f s (driver-side)")
      rows.take(40).foreach { case (site, r) =>
        println(f"   ${r.ms}%7d ms  n=${r.n}%-4d $site")
      }
    }
    spark.stop()
  }
}
