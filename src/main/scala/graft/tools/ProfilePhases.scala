package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer (guide §1): replay the matview lifecycle
  * queries' bodies with explicit per-phase timers, so each second is
  * attributed to a CALL (managed write, create, merge, refresh, read)
  * instead of a Spark job soup. Not part of the driver contract. */
object ProfilePhases {
  private var t0 = 0L
  private def phase[A](name: String)(body: => A): A = {
    val s = System.nanoTime()
    val r = body
    println(f"  ${(System.nanoTime() - s) / 1e9}%7.2f s  $name")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("matview")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("customer_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    (1 to reps).foreach { rep =>
      println(s"== $which rep $rep")
      val w0 = System.nanoTime()
      which match {
        case "matview" => matview(spark, sfDir)
        case "stream_matview" => streamMatview(spark, sfDir)
        case other => sys.error(s"unknown lifecycle: $other")
      }
      println(f"  ${(System.nanoTime() - w0) / 1e9}%7.2f s  TOTAL")
    }
    spark.stop()
  }

  private def matview(spark: SparkSession, dir: String): Unit = {
    import graft.storage.{BasicStorage, MatView}
    val st = new BasicStorage(spark)
    val orders = spark.read
      .parquet(dir.stripSuffix("/") + "/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_prof_mv").toString
    val (path, view) = (root + "/t", root + "/v")
    phase("st.write managed")(st.write(base, path, "delta", "overwrite"))
    phase("MatView.create")(MatView.create(spark, st, path, view,
      Seq("o_custkey"), "o_totalprice"))
    phase("merge captured")(st.merge(
      orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      path, "full.o_orderkey = incremental.o_orderkey",
      captureChanges = true))
    phase("refresh 1 (incremental)")(MatView.refresh(spark, st, view))
    phase("delete captured")(graft.storage.Delete.where(spark, st, path,
      "o_totalprice < 10000", captureChanges = true))
    phase("refresh 2 (rescan)")(MatView.refresh(spark, st, view))
    phase("read+count")(MatView.read(spark, view).count())
  }

  private def streamMatview(spark: SparkSession, dir: String): Unit = {
    import graft.storage.{BasicStorage, MatView}
    val st = new BasicStorage(spark)
    val orders = spark.read
      .parquet(dir.stripSuffix("/") + "/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 5 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_prof_smv").toString
    val (path, view, cp) = (root + "/t", root + "/v", root + "/cp")
    phase("st.write managed")(st.write(base, path, "delta", "overwrite"))
    phase("MatView.create")(MatView.create(spark, st, path, view,
      Seq("o_custkey"), "o_totalprice"))
    val q = phase("start stream")(
      graft.streaming.StreamingOps.maintainMatView(spark, st, view, cp))
    try {
      phase("merge 1")(st.merge(
        orders.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
        path, "full.o_orderkey = incremental.o_orderkey",
        captureChanges = true))
      phase("drain 1")(q.processAllAvailable())
      phase("delete uncaptured")(
        graft.storage.Delete.where(spark, st, path, "o_totalprice < 10000"))
      phase("drain 2 (rebuild)")(q.processAllAvailable())
      phase("merge 2")(st.merge(
        orders.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0),
        path, "full.o_orderkey = incremental.o_orderkey",
        captureChanges = true))
      phase("drain 3")(q.processAllAvailable())
    } finally phase("stop stream")(q.stop())
    phase("refresh noop probe")(MatView.refresh(spark, st, view))
    phase("read+count")(MatView.read(spark, view).count())
  }
}
