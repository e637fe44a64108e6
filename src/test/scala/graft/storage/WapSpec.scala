package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Expectations.{InRange, NotNull}

class WapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The table's WAP stage siblings (`<t>__graft_stage_<uuid>`) —
    * empty ⟺ no stage debris. */
  private def stageDirs(path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    Fs.listSubdirs(spark, p.getParent.toString)
      .filter(_.startsWith(p.getName + WriteAuditPublish.StagePrefix))
  }

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
    assert(stageDirs(path).isEmpty)
  }

  test("failOnConcurrentWrite: a mutation committing during the " +
      "audit refuses the publish, stage cleaned, merge preserved") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_conc") + "/t"
    st.write((1L to 50L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    // the concurrent writer: waits for the stage dir (proof the WAP
    // run is past its snapshot) then commits a delete
    val racer = new Thread(() => {
      val deadline = System.currentTimeMillis() + 30000
      while (stageDirs(path).isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(5)
      Delete.where(spark, st, path, "id <= 10")
    })
    racer.start()
    try {
      intercept[ConcurrentWriteException] {
        WriteAuditPublish.run(spark, st,
          (100L to 140L).map(i => (i, 1.0)).toDF("id", "v"), path,
          Seq(NotNull("id")), failOnConcurrentWrite = true)
      }
    } finally racer.join()
    assert(stageDirs(path).isEmpty,
      "a refused publish must clean its stage")
    val ids = st.read(path, "delta").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (11L to 50L).toSet,
      s"the concurrent delete must be preserved, the staged frame " +
        s"must NOT have published: $ids")
    // no false positive: with nothing racing, the guarded publish lands
    WriteAuditPublish.run(spark, st,
      Seq((200L, 1.0)).toDF("id", "v"), path,
      Seq(NotNull("id")), failOnConcurrentWrite = true)
    assert(st.read(path, "delta").select("id")
      .collect().map(_.getLong(0)).toSet == Set(200L))
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

  test("two interleaved WAP runs on one table: each publish is " +
      "exactly its own audited frame — never a mix, never the other " +
      "run's content under this run's audit") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_vs_wap") + "/t"
    st.write(Seq((0L, 50.0)).toDF("id", "v"), path, "delta", "overwrite")
    // disjoint value ranges, each run auditing ITS OWN range: with a
    // shared stage dir, run A could publish B's frame — content its
    // audit never admitted. Per-run stages make that impossible.
    val frameA = (1L to 40L).map(i => (i, 5.0)) // v ∈ [0,10]
    val frameB = (101L to 140L).map(i => (i, 105.0)) // v ∈ [100,110]
    for (_ <- 1 to 3) {
      @volatile var failure: Throwable = null
      def runner(rows: Seq[(Long, Double)], lo: Double, hi: Double) =
        new Thread(() => {
          try {
            val report = WriteAuditPublish.run(spark, st,
              rows.toDF("id", "v"), path,
              Seq(NotNull("id"), InRange("v", lo, hi)))
            assert(report.agg(sum("violations")).head().getLong(0) == 0L)
          } catch {
            case _: ConcurrentWriteException => () // loud refusal: fine
            case t: Throwable => failure = t
          }
        })
      val tA = runner(frameA, 0.0, 10.0)
      val tB = runner(frameB, 100.0, 110.0)
      tA.start(); tB.start(); tA.join(); tB.join()
      if (failure != null) throw failure
      val got = st.read(path, "delta").as[(Long, Double)]
        .collect().sorted.toSeq
      assert(got == frameA.sorted || got == frameB.sorted,
        s"the table must be EXACTLY one run's audited frame, got " +
          s"${got.size} rows spanning v=${got.map(_._2).distinct}")
      assert(stageDirs(path).isEmpty,
        "completed runs must leave no stage debris")
    }
  }

  test("vacuum sweeps an aged orphan WAP stage, skip-reports a young " +
      "one (possibly a live audit)") {
    val st = new BasicStorage(spark)
    val path = tempDir("wap_vacuum") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path, "delta", "overwrite")
    // plant two "crashed run" stages: one aged past the horizon, one
    // fresh
    val aged = path + WriteAuditPublish.StagePrefix + "_agedrun"
    val young = path + WriteAuditPublish.StagePrefix + "_youngrun"
    Seq((9L, 9.0)).toDF("id", "v").write.parquet(aged)
    Seq((8L, 8.0)).toDF("id", "v").write.parquet(young)
    val fs = new org.apache.hadoop.fs.Path(aged)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val old = System.currentTimeMillis() -
      Maintenance.OrphanMinAgeDefaultMs - 60000L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(aged), true)
    while (it.hasNext) fs.setTimes(it.next().getPath, old, -1)
    val actions = Maintenance.vacuum(spark, path)
    // action targets are FS-qualified (file:/...) — compare by suffix
    assert(actions.exists(a => a.kind == "delete" && a.target.endsWith(aged)),
      s"aged stage must be swept: $actions")
    assert(actions.exists(a => a.kind == "skip" && a.target.endsWith(young)),
      s"young stage must be skip-reported, not swept: $actions")
    assert(!Fs.exists(spark, aged) && Fs.exists(spark, young))
    // live table untouched by the sweep
    assert(st.read(path, "delta").count() == 1L)
  }
}
