package graft.storage

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  private def mkdirs(p: String): Unit =
    assert(new File(p).mkdirs() || new File(p).isDirectory)

  private def touch(p: String): Unit = {
    mkdirs(new File(p).getParent)
    assert(new File(p).createNewFile())
  }

  test("vacuum removes every debris class; live data byte-untouched") {
    val root = tempDir("vac")
    val path = s"$root/t"
    st.write((1 to 50).map(i => (i.toLong, s"p${i % 3}", i * 2.0))
      .toDF("id", "part", "v"), path, "delta", "overwrite",
      partitionFields = Seq("part"))
    MorDelete.deleteWhere(spark, st, path, "id = 1", Seq("id"))
    // record the complete live file inventory before planting debris
    def inventory(): Map[String, Long] =
      Fs.dataFiles(spark, path).toMap
    val before = inventory()
    assert(before.nonEmpty)

    // debris class 1: crashed COW staging beside the table
    touch(s"${path}__graft_tmp/part=p0/junk.parquet")
    // debris class 2: post-swap aside that never got deleted
    touch(s"${path}__graft_old/part=p0/old.parquet")
    // debris class 3: sidecar staging + stale sidecar aside (live
    // _graft_tombstones exists from the MoR delete above)
    touch(s"$path/_graft_tombstones__tmp/part-0.parquet")
    touch(s"$path/_graft_tombstones__old/part-0.parquet")
    // debris class 4: a crashed near-dup index generation append
    touch(s"$path/_myindex/inc-3__tmp/bands/b.parquet")
    mkdirs(s"$path/_myindex/params")

    // dry run lists everything and touches nothing
    val plan = Maintenance.vacuum(spark, path, dryRun = true)
    assert(plan.size == 5, s"expected 5 planned actions, got $plan")
    assert(plan.forall(_.kind == "delete"))
    assert(new File(s"${path}__graft_tmp").exists())
    assert(new File(s"$path/_graft_tombstones__tmp").exists())

    val done = Maintenance.vacuum(spark, path)
    assert(done.map(a => (a.kind, a.target)).toSet ==
      plan.map(a => (a.kind, a.target)).toSet)
    Seq(s"${path}__graft_tmp", s"${path}__graft_old",
        s"$path/_graft_tombstones__tmp", s"$path/_graft_tombstones__old",
        s"$path/_myindex/inc-3__tmp")
      .foreach(p => assert(!new File(p).exists(), s"$p must be gone"))
    // live data untouched: identical file set, identical rows
    assert(inventory() == before)
    assert(new File(s"$path/_graft_tombstones").exists(),
      "the live tombstone sidecar must survive")
    assert(st.read(path, "delta").count() == 50)
    // idempotent: nothing left to do
    assert(Maintenance.vacuum(spark, path).isEmpty)
  }

  test("vacuum heals an orphaned aside instead of deleting it") {
    val root = tempDir("vac_heal")
    val path = s"$root/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, "delta",
      "overwrite")
    MorDelete.deleteWhere(spark, st, path, "id = 1", Seq("id"))
    // simulate a crash between swapInStaged's two renames: the live
    // sidecar is parked aside and the staged replacement vanished
    Fs.renameChecked(spark, s"$path/_graft_tombstones",
      s"$path/_graft_tombstones__old")
    val plan = Maintenance.vacuum(spark, path, dryRun = true)
    assert(plan.exists(a => a.kind == "heal" &&
      a.target.endsWith("_graft_tombstones__old")), s"plan was $plan")
    Maintenance.vacuum(spark, path)
    assert(new File(s"$path/_graft_tombstones").exists(),
      "the only tombstone copy must be restored, not deleted")
    assert(MorDelete.read(spark, st, path, Seq("id")).count() == 1,
      "the healed sidecar must still hide the deleted row")
  }

  test("vacuum completes an interrupted table COW swap") {
    val root = tempDir("vac_swap")
    val path = s"$root/t"
    st.write(Seq((1L, "old")).toDF("id", "v"), path, "delta", "overwrite")
    // stage a complete rewrite, then crash mid-swap: live root parked
    // aside, staged tmp never renamed in
    Seq((1L, "new"), (2L, "newer")).toDF("id", "v")
      .write.parquet(s"${path}__graft_tmp")
    Fs.copyDirChecked(spark, s"$path/_graft_log",
      s"${path}__graft_tmp/_graft_log")
    Fs.renameChecked(spark, path, s"${path}__graft_old")
    val plan = Maintenance.vacuum(spark, path, dryRun = true)
    assert(plan.exists(a => a.kind == "heal" &&
      a.target == s"${path}__graft_tmp"), s"plan was $plan")
    Maintenance.vacuum(spark, path)
    assert(st.read(path, "delta").count() == 2,
      "the completed swap must serve the staged rewrite")
    assert(!new File(s"${path}__graft_old").exists())
    assert(!new File(s"${path}__graft_tmp").exists())
  }

  test("vacuum restores a root whose swap lost the staging side") {
    val root = tempDir("vac_restore")
    val idx = s"$root/idx"
    Seq((1, 2)).toDF("a", "b").write.parquet(idx)
    // interior debris that was INSIDE the root when it was parked
    // aside — the same vacuum call must heal the root AND then sweep
    // its interior
    assert(new File(s"$idx/stale__tmp").mkdirs())
    // generic-index crash window: live root parked aside, no tmp
    Fs.renameChecked(spark, idx, idx + "__old")
    val plan = Maintenance.vacuum(spark, idx, dryRun = true)
    assert(plan.map(_.kind) == Seq("heal"))
    val done = Maintenance.vacuum(spark, idx)
    assert(spark.read.parquet(idx).count() == 1)
    assert(!new File(idx + "__old").exists())
    assert(!new File(s"$idx/stale__tmp").exists(),
      "the healed root's interior must be swept in the same call")
    assert(done.exists(a => a.kind == "delete" &&
      a.target.endsWith("stale__tmp")))
  }

  test("orphan sweep: a young marker-less batch survives vacuum, its " +
      "merge completes and replicates; an old orphan is fenced+swept") {
    val root = tempDir("vac_orphan_age")
    val src = s"$root/src"
    val rep = s"$root/rep"
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    st.write(base, src, "delta", "overwrite")
    st.write(base, rep, "delta", "overwrite") // replica at the snapshot
    // one real committed capture establishes the feed era
    st.merge(Seq((2L, "B")).toDF("id", "v"), src,
      "full.id = incremental.id", captureChanges = true)
    // crash debris: a marker-less batch stamped 25 h ago (past the
    // 24 h default horizon) — a genuinely dead capture
    val oldStamp =
      (System.currentTimeMillis() - 25L * 3600 * 1000) * 1000000L
    Seq((9L, "z")).toDF("id", "v")
      .withColumn("_change_type", lit("insert"))
      .write.parquet(s"$src/${Merge.ChangesDirName}/batch=$oldStamp")
    // live capture mid-flight: fresh stamp, data rewrite not yet done,
    // marker lands last by design — exactly what a racing vacuum sees
    val young = Merge.nextBatchStamp()
    Seq((3L, "c")).toDF("id", "v")
      .withColumn("_change_type", lit("insert"))
      .write.parquet(s"$src/${Merge.ChangesDirName}/batch=$young")

    val plan = Maintenance.vacuum(spark, src, dryRun = true)
    assert(plan.exists(a => a.kind == "skip" && a.dest == young.toString),
      s"young batch must be skip-reported, plan was $plan")
    assert(plan.exists(a => a.kind == "fence" && a.dest == oldStamp.toString))
    assert(plan.exists(a => a.kind == "delete" &&
      a.target.endsWith(s"batch=$oldStamp")))
    assert(!plan.exists(a => a.kind == "delete" &&
      a.target.endsWith(s"batch=$young")),
      s"a vacuum racing a live capture must not sweep it: $plan")

    Maintenance.vacuum(spark, src)
    assert(new File(s"$src/${Merge.ChangesDirName}/batch=$young").exists(),
      "the in-flight capture must survive the sweep")
    assert(!new File(s"$src/${Merge.ChangesDirName}/batch=$oldStamp").exists())
    assert(GraftLog.txnBatches(spark, src, Merge.ChangesBarrierApp)
      .contains(oldStamp), "the dead orphan must be fenced before removal")

    // the live capture now COMPLETES: data rewrite lands, marker last
    st.write(Seq((3L, "c")).toDF("id", "v"), src, "delta", "append")
    Fs.touch(spark,
      s"$src/${Merge.ChangesDirName}/batch=$young/${Merge.ChangesCommitMarker}")

    // replication sees the completed batch — no silent divergence. The
    // poll-triggered mode replays off a clock, so no new feed FILE is
    // needed to fire it (the committed batch's files predate the run).
    val q = graft.streaming.StreamingOps.replicateStream(spark, st, src,
      rep, Seq("id"), s"$root/cp", pollInterval = Some("1 second"))
    try {
      def table(p: String) = st.read(p, "delta")
        .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
      // the replica is OVERWRITTEN in place per applied batch; a poll
      // read racing that overwrite sees FILE_NOT_EXIST transiently —
      // retry until a complete read lands (equality implies a
      // successful full read, after which no further batch rewrites)
      def tableRetry(p: String): Option[Seq[(Long, String)]] =
        try Some(table(p)) catch { case _: Exception => None }
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        !tableRetry(rep).contains(table(src))) Thread.sleep(250)
      assert(table(rep) == table(src),
        "replica must apply the survived capture's changes")
      assert(table(rep).contains((3L, "c")))
      assert(!table(rep).exists(_._1 == 9L),
        "the swept dead orphan's changes never committed anywhere")
    } finally q.stop()

    // a forced sweep (age 0) still removes any marker-less batch
    val forcedStamp = Merge.nextBatchStamp()
    Seq((8L, "y")).toDF("id", "v")
      .withColumn("_change_type", lit("insert"))
      .write.parquet(s"$src/${Merge.ChangesDirName}/batch=$forcedStamp")
    Maintenance.vacuum(spark, src, orphanMinAgeMs = Some(0L))
    assert(!new File(
      s"$src/${Merge.ChangesDirName}/batch=$forcedStamp").exists())
  }

  test("partition values ending in a debris suffix are never touched") {
    val root = tempDir("vac_part")
    val path = s"$root/t"
    st.write(Seq((1L, "x__tmp"), (2L, "y__old"), (3L, "z"))
      .toDF("id", "part"), path, "delta", "overwrite",
      partitionFields = Seq("part"))
    assert(Maintenance.vacuum(spark, path, dryRun = true).isEmpty,
      "partition dirs must be invisible to the sweep")
    Maintenance.vacuum(spark, path)
    assert(st.read(path, "delta").count() == 3)
    assert(st.read(path, "delta").filter(col("part") === "x__tmp")
      .count() == 1)
  }
}
