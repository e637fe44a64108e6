package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Expectations.{InRange, NotNull}

class WapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("failing audit aborts: live table untouched, stage cleaned") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_abort") + "/t"
    // v1 published clean
    WriteAuditPublish.run(spark, st,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), path,
      Seq(NotNull("id"), InRange("v", 0.0, 100.0)))
    assert(st.read(path, "parquet").count() == 2L)

    // v2 carries a planted violation — publish must not happen
    val e = intercept[AuditFailedException] {
      WriteAuditPublish.run(spark, st,
        Seq((3L, 10.0), (4L, 999.0)).toDF("id", "v"), path,
        Seq(NotNull("id"), InRange("v", 0.0, 100.0)))
    }
    assert(e.violations == Seq(("in_range(v)", 1L)))
    // live table still v1, byte-for-byte readable
    assert(st.read(path, "parquet").as[(Long, Double)].collect().sorted
      .toSeq == Seq((1L, 10.0), (2L, 20.0)))
    // stage removed — no half-published debris
    assert(!Fs.exists(spark, path + "__graft_stage"))
  }

  test("passing audit publishes over a managed table, log carried") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_pub") + "/t"
    st.write(Seq((1L, "old")).toDF("id", "s"), path, "delta", "overwrite")
    val report = WriteAuditPublish.run(spark, st,
      Seq((2L, "new"), (3L, "new")).toDF("id", "s"), path,
      Seq(NotNull("s")))
    assert(report.agg(sum("violations")).head().getLong(0) == 0L)
    assert(st.read(path, "parquet").count() == 2L)
    val ops = GraftLog.history(spark, path).collect().map(_.getString(0))
    assert(ops.contains("WAP_PUBLISH") && ops.contains("WRITE"),
      "prior log entries must survive the publish swap")
  }
}
