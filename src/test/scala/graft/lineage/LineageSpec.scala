package graft.lineage

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Schemas
import graft.storage.BasicStorage

/** Live lineage tests: native plan walk + end-to-end log write
  * (ports of test/data_lineage/test_write_log.py). */
class LineageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("plan walk: file scan resolves to root path") {
    val dir = tempDir("lineage_src")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val sources = PlanWalk.dataSources(df)
    assert(sources.length == 1)
    assert(sources.head.contains(dir))
  }

  test("plan walk: join of file scan and local relation finds both") {
    val dir = tempDir("lineage_join")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val file = spark.read.parquet(dir)
    val local = Seq((1L, "x")).toDF("id", "w")
    val sources = PlanWalk.dataSources(file.join(local, Seq("id"), "left"))
    assert(sources.exists(_.contains(dir)))
    assert(sources.exists(_.startsWith("memory_scan:")))
  }

  test("plan walk: filter + select keeps the scan visible (pushdown)") {
    val dir = tempDir("lineage_pushdown")
    Seq((1L, "a", 2.0)).toDF("id", "v", "x").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter($"id" > 0).select("v")
    assert(PlanWalk.dataSources(df).exists(_.contains(dir)))
  }

  test("plan walk sees through cached plans") {
    val dir = tempDir("lineage_cache")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).cache()
    try {
      df.count() // materialize the cache
      assert(PlanWalk.dataSources(df.select("v")).exists(_.contains(dir)))
    } finally df.unpersist()
  }

  test("lineage log end-to-end: observed write appends a full record") {
    val srcDir = tempDir("lineage_e2e_src")
    val outDir = tempDir("lineage_e2e_out")
    val logDir = tempDir("lineage_e2e_log") + "/log"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(srcDir)

    val st = new BasicStorage(spark)
    st.registerOutputObserver(new DataLineageLogger(logDir))
    st.write(spark.read.parquet(srcDir), outDir, "parquet", "overwrite")

    val log = spark.read.parquet(logDir)
    val expectedSchema = StructType(Seq(
      StructField("output_path", StringType),
      StructField("data_sources", ArrayType(StringType)),
      StructField("transform_code_file", StringType),
      StructField("observation_ts", TimestampType)))
    assert(Schemas.areEqual(log.schema, expectedSchema))
    val row = log.head()
    assert(row.getAs[String]("output_path") == outDir)
    assert(row.getSeq[String](row.fieldIndex("data_sources"))
      .exists(_.contains(srcDir)))
    assert(row.getAs[String]("transform_code_file") != null)
    assert(row.getAs[java.sql.Timestamp]("observation_ts") != null)
  }

  test("hanging plan capture times out with an ERROR record (test_observer.py:24-32)") {
    val outDir = tempDir("lineage_to_out")
    val logDir = tempDir("lineage_to_log") + "/log"
    val st = new BasicStorage(spark)
    st.registerOutputObserver(new DataLineageLogger(logDir, timeoutSeconds = 1) {
      override protected def computeDataSources(
          df: org.apache.spark.sql.DataFrame): Seq[String] = {
        Thread.sleep(3000); Seq("never")
      }
    })
    st.write(Seq((1L, "a")).toDF("id", "v"), outDir, "parquet", "overwrite")
    val sources = spark.read.parquet(logDir).head()
      .getSeq[String](1)
    assert(sources == Seq(
      "ERROR. Unable to read dataframe execution plan. Timed out after 1 seconds."))
  }

  test("lineage logging does not recurse into its own log writes") {
    val srcDir = tempDir("lineage_rec_src")
    val outDir = tempDir("lineage_rec_out")
    val logDir = tempDir("lineage_rec_log") + "/log"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(srcDir)
    val st = new BasicStorage(spark)
    st.registerOutputObserver(new DataLineageLogger(logDir))
    st.write(spark.read.parquet(srcDir), outDir, "parquet", "overwrite")
    st.write(spark.read.parquet(srcDir), outDir, "parquet", "overwrite")
    // exactly one record per observed write — none for the log writes
    assert(spark.read.parquet(logDir).count() == 2)
  }
}
