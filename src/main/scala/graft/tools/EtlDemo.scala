package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipelines.{FileInput, FileOutput, MergeOutput, Pipelines}
import graft.storage.{BasicStorage, GraftStorage, GraftLog, IsolatedStorage}

/** End-to-end consumer demo of the utility surface: configure → isolated
  * storage → ETL pipeline → merge → lineage log. Mirrors the reference's
  * examples/ flow on the driver test data. Run:
  *   sbt "runMain graft.tools.EtlDemo"
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val mnt = java.nio.file.Files.createTempDirectory("demo_mnt").toString
    new java.io.File(s"$mnt/jorvik_isolation").mkdirs()
    val logPath = s"$mnt/lineage/log"

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("io.jorvik.data_lineage.log_path", logPath)
      .config("io.jorvik.storage.mount_point", mnt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // configure() with an explicit context -> isolated storage + lineage
    val st = GraftStorage.configure(spark, Some(() => "demo-branch"),
      verbose = true)
    println(s"storage class: ${st.getClass.getSimpleName}")

    // Seed "production" data via basic storage
    val basic = new BasicStorage(spark)
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").limit(1000)
    basic.write(orders, s"$mnt/bronze/orders", "delta", "overwrite")

    // ETL: bronze -> silver through the isolated storage
    val pipeline = Pipelines.etl(
      inputs = Seq(FileInput(s"$mnt/bronze/orders", "delta",
        storage = Some(st))),
      outputs = Seq(FileOutput(s"$mnt/silver/orders_by_status", "delta",
        "overwrite", storage = Some(st))),
      validateSchemas = false) { case Seq(o) =>
      Seq(o.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total")))
    }
    pipeline.run(spark)

    val silverIso = s"$mnt/jorvik_isolation/demo-branch/silver/orders_by_status"
    println(s"isolated silver exists: ${basic.exists(silverIso)}")
    println(s"production silver exists: ${basic.exists(s"$mnt/silver/orders_by_status")}")

    // Merge through the pipeline layer
    val inc = Seq(("Z", 1L, 0.0)).toDF("o_orderstatus", "n", "total")
    val mergeOut = MergeOutput(s"$mnt/silver/orders_by_status",
      "full.o_orderstatus = incremental.o_orderstatus", storage = Some(st))
    mergeOut.load(spark, inc)
    st.read(s"$mnt/silver/orders_by_status", "delta")
      .orderBy("o_orderstatus").show()

    // History + lineage
    println("op history (isolated silver):")
    GraftLog.history(spark, silverIso).show(false)
    println("lineage log:")
    spark.read.parquet(logPath)
      .select("output_path", "data_sources").show(false)

    val iso = st.asInstanceOf[IsolatedStorage]
    val prodRows = iso.readProductionData(
      s"$mnt/jorvik_isolation/demo-branch/bronze/orders", "delta").count()
    println(s"production bronze rows via readProductionData: $prodRows")
    spark.stop()
  }
}
