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

  test("publish is an overwrite: feed drops behind a horizon, " +
      "tombstones go with the replaced rows") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_feed") + "/t"
    st.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((3L, 30.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    MorDelete.deleteWhere(spark, st, path, "id = 2", Seq("id"))
    WriteAuditPublish.run(spark, st,
      Seq((2L, 50.0), (9L, 90.0)).toDF("id", "v"), path,
      Seq(NotNull("id")))
    // the published content replaced the table wholesale: the feed
    // describes dead rows and is gone; a carried tombstone for id 2
    // would have hidden the fresh (2, 50.0) row
    assert(!Merge.hasChanges(spark, path))
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)))
    assert(MorDelete.read(spark, st, path, Seq("id"))
      .as[(Long, Double)].collect().sorted.toSeq
      == Seq((2L, 50.0), (9L, 90.0)))
    // pre-publish stamps refuse instead of replaying the dead feed
    // over the published content
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
    }
    assert(e.getMessage.contains("horizon"))
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
