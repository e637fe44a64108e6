package graft.storage

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DeleteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  test("unpartitioned delete removes matches through the checked swap") {
    val path = tempDir("del_unpart") + "/t"
    st.write((1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "g"),
      path, "delta", "overwrite")
    val n = Delete.where(spark, st, path, "g = 0")
    assert(n == 20)
    val back = st.read(path, "delta")
    assert(back.count() == 80)
    assert(back.filter(col("g") === 0).count() == 0)
    // history records the operation
    assert(GraftLog.history(spark, path).head().getString(
      GraftLog.history(spark, path).schema.fieldIndex("operation"))
      == "DELETE")
  }

  test("null conditions keep rows (SQL DELETE semantics)") {
    val path = tempDir("del_null") + "/t"
    st.write(Seq((1L, Some(1)), (2L, None), (3L, Some(3)))
      .toDF("id", "v"), path, "delta", "overwrite")
    // v > 2 is null for the null row — it must survive
    val n = Delete.where(spark, st, path, "v > 2")
    assert(n == 1)
    assert(st.read(path, "delta").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("partitioned delete rewrites only affected partitions; empties cleared") {
    val path = tempDir("del_part") + "/t"
    val df = (1 to 90).map(i => (i.toLong, s"p${i % 3}", i * 1.0))
      .toDF("id", "part", "v")
    st.write(df, path, "delta", "overwrite",
      partitionFields = Seq("part"))
    def files(p: String): Set[String] = {
      val d = new File(s"$path/part=$p")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val untouchedBefore = files("p2")
    assert(untouchedBefore.nonEmpty)
    // p0 deleted entirely, p1 partially (v > 50), p2 untouched
    val n = Delete.where(spark, st, path,
      "part = 'p0' OR (part = 'p1' AND v > 50)")
    assert(n == 30 + (1 to 90).count(i => i % 3 == 1 && i > 50))
    // the fully-deleted partition directory is gone (dynamic overwrite
    // alone would have left it behind)
    assert(files("p0").isEmpty, "emptied partition dir must be cleared")
    // the untouched partition's files are byte-for-byte the same ones
    assert(files("p2") == untouchedBefore,
      "untouched partition must not be rewritten")
    val back = st.read(path, "delta")
    assert(back.filter(col("part") === "p0").count() == 0)
    assert(back.filter(col("part") === "p2").count() == 30)
  }

  test("wide deletes (>1000 affected partitions) prune via semi-join, not a giant OR") {
    // plan shape first: the pruning helper must choose the broadcast
    // semi-join above the 1000-partition threshold (a 10⁴-arm literal
    // OR would crush the optimizer on a routine retention delete) and
    // the literal predicate below it
    val df = Seq((1L, 1, 0)).toDF("id", "part", "flag")
    val narrow = Delete.prunedToAffected(spark, df, Seq("part"),
      (1 to 3).map(i => Seq[Any](i)))
    assert(!narrow.queryExecution.logical.toString.contains("Join"),
      "a narrow delete must keep the literal partition predicate")
    val wide = Delete.prunedToAffected(spark, df, Seq("part"),
      (1 to 1001).map(i => Seq[Any](i)))
    assert(wide.queryExecution.logical.toString.contains("LeftSemi"),
      "a wide delete must prune via the broadcast semi-join")
    assert(!wide.queryExecution.logical.toString.contains("1001"),
      "no 1001-arm literal predicate in the wide plan")

    // end to end: 1050 partitions all affected, one surviving row each
    val path = tempDir("del_wide") + "/t"
    val rows = (1 to 1050).flatMap(k =>
      Seq((k.toLong, k, 0), (k + 10000L, k, 1)))
    st.write(rows.toDF("id", "part", "flag"), path, "delta", "overwrite",
      partitionFields = Seq("part"))
    val n = Delete.where(spark, st, path, "flag = 1")
    assert(n == 1050L)
    val back = st.read(path, "delta")
    assert(back.count() == 1050L)
    assert(back.filter(col("flag") === 1).count() == 0L)
    assert(back.select(countDistinct(col("part"))).head().getLong(0) == 1050L)
  }

  test("deleting EVERY row leaves a readable empty table (both paths)") {
    // unpartitioned: the COW rewrite writes a zero-row parquet —
    // the table must stay readable (schema intact) and writable
    val path = tempDir("del_all") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      path, "delta", "overwrite")
    assert(Delete.where(spark, st, path, "id >= 0") == 10)
    val back = st.read(path, "delta")
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "g"))
    // the emptied table accepts new rows
    st.write(Seq((99L, 1)).toDF("id", "g"), path, "delta", "append")
    assert(st.read(path, "delta").count() == 1)
    // partitioned: every partition dir cleared, table readable
    val pPath = tempDir("del_all_p") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      pPath, "delta", "overwrite", partitionFields = Seq("g"))
    assert(Delete.where(spark, st, pPath, "id >= 0") == 10)
    assert(st.read(pPath, "delta").count() == 0)
    // MoR: tombstone every row, compact — same emptied-table contract
    val mPath = tempDir("del_all_m") + "/t"
    st.write((1 to 6).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      mPath, "delta", "overwrite")
    MorDelete.deleteWhere(spark, st, mPath, "id >= 0", Seq("id"))
    assert(MorDelete.compact(spark, st, mPath, Seq("id")) == 6)
    val mBack = st.read(mPath, "delta")
    assert(mBack.count() == 0)
    assert(mBack.schema.fieldNames.toSeq == Seq("id", "g"))
  }

  test("zero matches is a no-op returning 0") {
    val path = tempDir("del_none") + "/t"
    st.write(Seq((1L, 1)).toDF("id", "v"), path, "delta", "overwrite")
    assert(Delete.where(spark, st, path, "v = 99") == 0L)
    assert(st.read(path, "delta").count() == 1)
  }

  test("non-managed path is rejected") {
    val path = tempDir("del_raw") + "/t"
    Seq((1L, 1)).toDF("id", "v").write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      Delete.where(spark, st, path, "v = 1")
    }
    assert(e.getMessage.contains("not a Delta Table"))
  }

  test("MoR delete: files untouched, reads subtract, compact applies") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor") + "/t"
    val df = (1L to 100L).map(i => (i, i % 10, s"v$i")).toDF("id", "m", "v")
    st.write(df, path, "delta", "overwrite")
    def dataFiles = Fs.dataFiles(spark, path)
      .map { case (f, sz) => (f, sz) }.sortBy(_._1)
    val before = dataFiles

    // logical delete: no data file is rewritten, byte sizes identical
    val n1 = MorDelete.deleteWhere(spark, st, path, "m = 3", Seq("id"))
    assert(n1 == 10L)
    assert(dataFiles == before, "MoR delete must not touch data files")
    // a plain reader still sees all rows; the MoR view subtracts
    assert(st.read(path, "delta").count() == 100L)
    val live = MorDelete.read(spark, st, path, Seq("id"))
    assert(live.count() == 90L)
    assert(live.filter(col("m") === 3).count() == 0L)

    // re-delete of the same predicate: nothing live matches
    assert(MorDelete.deleteWhere(spark, st, path, "m = 3", Seq("id")) == 0L)
    // overlapping second delete counts only LIVE matches (m=3 already gone)
    val n2 = MorDelete.deleteWhere(spark, st, path,
      "id <= 20", Seq("id"))
    assert(n2 == 18L, s"two of id<=20 are m=3 tombstones, got $n2")
    assert(MorDelete.read(spark, st, path, Seq("id")).count() == 72L)

    // compact: tombstones fold into one physical rewrite and clear
    val removed = MorDelete.compact(spark, st, path, Seq("id"))
    assert(removed == 28L)
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)))
    assert(st.read(path, "delta").count() == 72L)
    assert(MorDelete.read(spark, st, path, Seq("id")).count() == 72L)
    // lifecycle is logged
    val ops = GraftLog.history(spark, path).collect().map(_.getString(0))
    assert(ops.contains("DELETE_MOR") && ops.contains("DELETE_COMPACT"))
  }

  test("tombstones survive an unrelated COW swap; compact still clears") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_swap") + "/t"
    st.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(MorDelete.deleteWhere(spark, st, path, "id <= 3", Seq("id")) == 3L)
    // an unpartitioned MERGE runs the checked COW swap — the
    // tombstone sidecar must ride across it, or deleted rows resurrect
    st.merge(Seq((10L, "V10")).toDF("id", "v"), path,
      "full.id = incremental.id")
    assert(Fs.exists(spark, MorDelete.tombstonePath(path)),
      "COW swap dropped the tombstone sidecar")
    val live = MorDelete.read(spark, st, path, Seq("id"))
    assert(live.count() == 7L &&
      live.filter(col("id") <= 3).count() == 0L,
      "logically deleted rows resurrected by the swap")
    // compact (its OWN swap) consumes and clears them
    assert(MorDelete.compact(spark, st, path, Seq("id")) == 3L)
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)))
    assert(st.read(path, "delta").count() == 7L)
  }

  test("delete-then-reinsert: a merge re-introducing a tombstoned key clears it") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_reinsert") + "/t"
    st.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(MorDelete.deleteWhere(spark, st, path, "id <= 3", Seq("id")) == 3L)
    // key 2 comes back as a FRESH insert (the physical row is still on
    // disk, so the merge sees it as a match — user intent is revival
    // either way); key 1 is actively UPDATED; key 3 stays deleted
    st.merge(Seq((1L, "fresh1"), (2L, "fresh2")).toDF("id", "v"), path,
      "full.id = incremental.id")
    val live = MorDelete.read(spark, st, path, Seq("id"))
    assert(live.filter(col("id").isin(1L, 2L)).count() == 2L,
      "re-introduced keys hidden by stale tombstones")
    assert(live.filter(col("id") === 3L).count() == 0L,
      "untouched tombstone must stay deleted")
    assert(live.count() == 9L)
    // compact must PRESERVE the revived rows and drop only key 3
    assert(MorDelete.compact(spark, st, path, Seq("id")) == 1L)
    val after = st.read(path, "delta")
    assert(after.filter(col("id") === 1L).head().getString(1) == "fresh1")
    assert(after.filter(col("id") === 2L).head().getString(1) == "fresh2")
    assert(after.count() == 9L,
      "compact destroyed rows re-introduced after a MoR delete")
  }

  test("delete-then-reinsert: managed append clears matching tombstones") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_append") + "/t"
    st.write((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    MorDelete.compact(spark, st, path, Seq("id")) // no-op, no sidecar
    assert(MorDelete.deleteWhere(spark, st, path, "id = 4", Seq("id")) == 1L)
    st.write(Seq((4L, "reborn")).toDF("id", "v"), path, "delta", "append")
    // the ONLY tombstone cleared — the sidecar itself must go, so the
    // no-sidecar fast path (plain reads, early-return compact) is back
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)),
      "empty tombstone sidecar left behind — MoR anti-join paid forever")
    val live = MorDelete.read(spark, st, path, Seq("id"))
    // the OLD physical row for key 4 is still on disk alongside the
    // appended one — both are visible once the tombstone clears (MoR
    // appends don't upsert; that's what merge is for). The point: the
    // fresh row is NOT hidden, and compact does NOT destroy it.
    assert(live.filter(col("id") === 4L).count() == 2L)
    assert(MorDelete.compact(spark, st, path, Seq("id")) == 0L)
    assert(st.read(path, "delta")
      .filter(col("v") === "reborn").count() == 1L)
  }

  test("a matched-but-not-updated key does NOT clear its tombstone") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_updcond") + "/t"
    st.write((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(MorDelete.deleteWhere(spark, st, path, "id = 2", Seq("id")) == 1L)
    // the merge MATCHES the (still physically present) tombstoned row
    // but its update condition is false — nothing is written for key 2,
    // so the logical delete must stand (clearing here would resurrect
    // the old row this merge never touched)
    st.merge(Seq((2L, "ghost"), (9L, "new9")).toDF("id", "v"), path,
      "full.id = incremental.id",
      updateCondition = Some("full.v = 'never'"))
    val live = MorDelete.read(spark, st, path, Seq("id"))
    assert(live.filter(col("id") === 2L).count() == 0L,
      "no-op matched merge resurrected a MoR-deleted row")
    assert(live.filter(col("id") === 9L).count() == 1L)
    // ...but a genuine update (condition true) DOES revive the key
    st.merge(Seq((2L, "back")).toDF("id", "v"), path,
      "full.id = incremental.id")
    assert(MorDelete.read(spark, st, path, Seq("id"))
      .filter(col("id") === 2L).count() == 1L)
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)))
  }

  test("append lacking the tombstone key columns fails loudly") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_badappend") + "/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, "delta", "overwrite")
    MorDelete.deleteWhere(spark, st, path, "id = 1", Seq("id"))
    val e = intercept[IllegalStateException] {
      st.write(Seq("only_v").toDF("v"), path, "delta", "append")
    }
    assert(e.getMessage.contains("tombstones") &&
      e.getMessage.contains("id"))
    // nothing landed: the guard fired before the write
    assert(st.read(path, "delta").count() == 2L)
  }

  test("reconcile refuses loudly above the driver-residence tombstone bound") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_bound") + "/t"
    st.write((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(MorDelete.deleteWhere(spark, st, path, "id <= 4", Seq("id")) == 4L)
    spark.conf.set(MorDelete.ReconcileMaxRowsKey, "3")
    try {
      // 4 tombstone rows > bound 3: any reconciling write must refuse
      // with the compact()-first message BEFORE anything lands
      val e = intercept[IllegalStateException] {
        st.write(Seq((1L, "fresh")).toDF("id", "v"), path, "delta",
          "append")
      }
      assert(e.getMessage.contains("compact()") &&
        e.getMessage.contains(MorDelete.ReconcileMaxRowsKey))
      assert(st.read(path, "delta").count() == 10L,
        "the refused write must not have landed")
      // compact applies the tombstones physically; the same write then
      // proceeds (no sidecar left to reconcile)
      assert(MorDelete.compact(spark, st, path, Seq("id")) == 4L)
      st.write(Seq((1L, "fresh")).toDF("id", "v"), path, "delta",
        "append")
      assert(MorDelete.read(spark, st, path, Seq("id")).count() == 7L)
    } finally spark.conf.unset(MorDelete.ReconcileMaxRowsKey)
    // under the (default) bound the lifecycle is unchanged: the
    // append clears key 5's tombstone (which, for append, resurrects
    // the prior row too — key-level tombstone semantics)
    assert(MorDelete.deleteWhere(spark, st, path, "id = 5", Seq("id")) == 1L)
    st.write(Seq((5L, "back")).toDF("id", "v"), path, "delta", "append")
    assert(MorDelete.read(spark, st, path, Seq("id"))
      .filter(col("id") === 5L).count() == 2L)
  }

  test("delete-then-reinsert reconciles on the PARTITIONED merge path too") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_part") + "/t"
    val df = (1L to 40L).map(i => (i, s"p${i % 4}", s"v$i"))
      .toDF("id", "part", "v")
    st.write(df, path, "delta", "overwrite", partitionFields = Seq("part"))
    assert(MorDelete.deleteWhere(spark, st, path,
      "id <= 8", Seq("id")) == 8L)
    // dynamic-overwrite branch (partitioned, not evolving): revive 3 and
    // 7 via the partition-pruned rewrite; 2 new rows land elsewhere
    st.merge(Seq((3L, "p3", "fresh3"), (7L, "p3", "fresh7"),
        (100L, "p0", "new")).toDF("id", "part", "v"),
      path, "full.id = incremental.id", partitionFields = Seq("part"))
    val live = MorDelete.read(spark, st, path, Seq("id"))
    assert(live.filter(col("id").isin(3L, 7L)).count() == 2L,
      "partitioned merge left stale tombstones hiding revived keys")
    assert(live.filter(col("id") === 2L).count() == 0L,
      "untouched tombstone must stay deleted")
    // compact preserves the revived rows, drops the remaining 6
    assert(MorDelete.compact(spark, st, path, Seq("id")) == 6L)
    val after = st.read(path, "delta")
    assert(after.filter(col("id") === 3L).select("v").head()
      .getString(0) == "fresh3")
    assert(after.count() == 35L) // 40 - 8 deleted + 2 revived + 1 new
  }

  test("captured delete writes a delete change batch; time travel " +
      "restores the deleted rows") {
    val path = tempDir("del_cdf") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      path, "delta", "overwrite")
    st.merge(Seq((11L, 1)).toDF("id", "g"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    val n = Delete.where(spark, st, path, "g = 0", captureChanges = true)
    assert(n == 3)
    // the feed gained a batch of pure `delete` rows
    val batches = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(batches.length == 2)
    assert(Merge.changeFeed(spark, path)
      .filter(col("batch") === batches.last)
      .select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    // pre-delete travel reconstructs the deleted rows exactly
    val back = Merge.readAsOf(spark, st, path, Seq("id"), stamp)
      .as[(Long, Int)].collect().sorted.toSeq
    assert(back == ((1 to 10).map(i => (i.toLong, i % 3)) :+ (11L, 1))
      .sorted)
    // and replayChanges of the delete batch onto it returns current
    val replayed = Merge.replayChanges(
      Merge.readAsOf(spark, st, path, Seq("id"), stamp),
      Merge.changeFeed(spark, path)
        .filter(col("batch") === batches.last), Seq("id"))
      .as[(Long, Int)].collect().sorted.toSeq
    assert(replayed == st.read(path, "delta")
      .as[(Long, Int)].collect().sorted.toSeq)
  }

  test("uncaptured delete on a feed-captured table fences time travel") {
    val path = tempDir("del_fence") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      path, "delta", "overwrite")
    st.merge(Seq((11L, 1)).toDF("id", "g"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    assert(Delete.where(spark, st, path, "g = 0") == 3)
    // the feed has a gap here: travel below the delete refuses loudly
    // instead of serving snapshots missing the deleted rows
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
    }
    assert(e.getMessage.contains("horizon"))
    // the current state stays servable at the barrier stamp
    val h = GraftLog.lastTxnBatch(spark, path,
      Merge.ChangesBarrierApp).get
    assert(Merge.readAsOf(spark, st, path, Seq("id"), h).count()
      == st.read(path, "delta").count())
    // a table with NO feed is untouched by the fence path: the
    // barrier is only recorded where there is history to corrupt
    val plain = tempDir("del_nofence") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      plain, "delta", "overwrite")
    assert(Delete.where(spark, st, plain, "g = 0") == 3)
    assert(GraftLog.lastTxnBatch(spark, plain,
      Merge.ChangesBarrierApp).isEmpty)
  }

  test("MoR compact on a feed-captured table fences time travel " +
      "(rows leave the raw timeline at compact, uncaptured)") {
    val path = tempDir("mor_fence") + "/t"
    st.write((1 to 10).map(i => (i.toLong, i % 3)).toDF("id", "g"),
      path, "delta", "overwrite")
    st.merge(Seq((11L, 1)).toDF("id", "g"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    MorDelete.deleteWhere(spark, st, path, "g = 0", Seq("id"))
    // tombstones alone do not change the raw file timeline: travel
    // still serves the pre-merge state
    assert(Merge.readAsOf(spark, st, path, Seq("id"), Long.MinValue)
      .count() == 10)
    assert(MorDelete.compact(spark, st, path, Seq("id")) == 3)
    // compact removed rows from the raw timeline without capturing
    // them — pre-compact stamps must refuse
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
    }
    assert(e.getMessage.contains("horizon"))
  }

  test("managed overwrite drops tombstones with the table they referred to") {
    val st = new BasicStorage(spark)
    val path = tempDir("mor_overwrite") + "/t"
    st.write((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"),
      path, "delta", "overwrite")
    MorDelete.deleteWhere(spark, st, path, "id <= 2", Seq("id"))
    st.write(Seq((1L, "new1"), (9L, "new9")).toDF("id", "v"),
      path, "delta", "overwrite")
    assert(!Fs.exists(spark, MorDelete.tombstonePath(path)),
      "stale tombstones would hide fresh rows with old keys")
    assert(MorDelete.read(spark, st, path, Seq("id")).count() == 2L)
  }

  test("heal rolls a crashed swap's BORN partitions back: the " +
      "manifest-recorded new dir is deleted with the restore, so a " +
      "moved row is never served twice") {
    val path = tempDir("del_bornheal") + "/t"
    val rows = (1L to 200L).map(i => (i, s"P${i % 2}", i * 1.0))
    st.write(rows.toDF("id", "part", "v"), path, "delta", "overwrite",
      Seq("part"))
    // plant the crash of a merge that MOVED row 7 from P1 into the
    // brand-new P9: P1's original parked, its replacement (without
    // row 7) live, P9 born and recorded — crash before the commit
    // rename retires the aside
    val aside = PartitionSwap.asidePath(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(aside))
    Fs.renameChecked(spark, s"$path/part=P1", s"$aside/part=P1")
    spark.range(1).selectExpr("7L AS id", "7.0D AS v")
      .write.parquet(s"$path/part=P9")
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      aside + "/" + PartitionSwap.BornDirName))
    Fs.writeText(spark,
      aside + "/" + PartitionSwap.BornDirName + "/born-0", "part=P9")
    // the next locked mutation heals first: P1 restored (row 7 back
    // in its ORIGINAL home), born P9 rolled back — never both
    st.merge(Seq((1L, "P0", 999.0)).toDF("id", "part", "v"), path,
      "full.id = incremental.id", partitionFields = Seq("part"))
    assert(!Fs.exists(spark, aside), "the heal consumed the aside")
    assert(!Fs.exists(spark, s"$path/part=P9"),
      "the born partition of the uncommitted mutation must roll back")
    val healed = st.read(path, "delta")
    assert(healed.filter(col("id") === 7L).count() == 1L,
      "the moved row must exist exactly once after the rollback")
    assert(healed.count() == 200L)
    // the VACUUM path must roll born partitions back too — with no
    // next writer, vacuum is the only healer, and deleting the aside
    // without the born rollback would destroy the only record while
    // the dir keeps double-serving
    Fs.renameChecked(spark, s"$path/part=P1", s"$aside/part=P1")
    spark.range(1).selectExpr("7L AS id", "7.0D AS v")
      .write.parquet(s"$path/part=P9")
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      aside + "/" + PartitionSwap.BornDirName))
    Fs.writeText(spark,
      aside + "/" + PartitionSwap.BornDirName + "/born-0", "part=P9")
    Maintenance.vacuum(spark, path)
    assert(!Fs.exists(spark, aside) && !Fs.exists(spark, s"$path/part=P9"),
      "vacuum must consume the aside AND roll the born partition back")
    val vHealed = st.read(path, "delta")
    assert(vHealed.filter(col("id") === 7L).count() == 1L &&
      vHealed.count() == 200L,
      "vacuum's heal must be exactly-once for the moved row")
  }

  test("partitioned merge/delete commit via rename-aside: a crashed " +
      "swap's parked partition heals at the next locked mutation, " +
      "emptied partitions are removed, no aside/tmp debris survives") {
    val path = tempDir("del_partswap") + "/t"
    val rows = (1L to 300L).map(i => (i, s"P${i % 3}", i * 1.0))
    st.write(rows.toDF("id", "part", "v"), path, "delta", "overwrite",
      Seq("part"))
    // plant a crashed partition swap: P0 parked, live dir missing
    val aside = PartitionSwap.asidePath(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(aside))
    Fs.renameChecked(spark, s"$path/part=P0", s"$aside/part=P0")
    assert(st.read(path, "delta").count() == 200L,
      "the planted crash hides P0 until a heal")
    // the next locked mutation (a merge) heals FIRST, so its rewrite
    // sees P0's rows; the merge itself commits via rename-aside
    st.merge(Seq((3L, "P0", 999.0)).toDF("id", "part", "v"), path,
      "full.id = incremental.id", partitionFields = Seq("part"))
    assert(!Fs.exists(spark, aside), "the heal consumed the aside")
    val out = st.read(path, "delta")
    assert(out.count() == 300L, "P0's parked rows must survive the merge")
    assert(out.filter(col("id") === 3L).select("v")
      .head().getDouble(0) == 999.0)
    // a delete emptying one whole partition: removed via the aside
    // mechanism, other partitions untouched, no debris
    val beforeP2 = Fs.dataFiles(spark, path)
      .filter(_._1.contains("part=P2")).sortBy(_._1)
    assert(Delete.where(spark, st, path, "part = 'P1'") == 100L)
    assert(!Fs.exists(spark, s"$path/part=P1"),
      "an emptied partition's dir must be removed")
    assert(Fs.dataFiles(spark, path)
      .filter(_._1.contains("part=P2")).sortBy(_._1) == beforeP2,
      "partitions outside the delete must stay byte-identical")
    assert(!Fs.exists(spark, aside) &&
      !Fs.exists(spark, path + "__graft_tmp"),
      "a completed commit leaves no aside or staging debris")
    assert(st.read(path, "delta").count() == 200L)
  }

  test("a RETIRED (consumed) partition-swap aside is swept, never " +
      "healed — a removed partition whose aside delete crashed " +
      "half-way cannot resurrect") {
    val path = tempDir("del_consumed") + "/t"
    st.write((1L to 200L).map(i => (i, s"P${i % 2}", i * 1.0))
      .toDF("id", "part", "v"), path, "delta", "overwrite", Seq("part"))
    // simulate: a delete removed P0, the swap retired the aside (the
    // commit point), then the recursive delete crashed with P0's leaf
    // still (partially) present in the consumed root
    val consumed = PartitionSwap.consumedPath(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(consumed))
    Fs.renameChecked(spark, s"$path/part=P0", s"$consumed/part=P0")
    // the next mutation's heal must SWEEP the retired root — healing
    // it would serve a partition with an arbitrary subset of its rows
    st.merge(Seq((1L, "P1", 999.0)).toDF("id", "part", "v"), path,
      "full.id = incremental.id", partitionFields = Seq("part"))
    assert(!Fs.exists(spark, consumed), "the retired aside must sweep")
    assert(!Fs.exists(spark, s"$path/part=P0"),
      "a committed removal must NOT resurrect from the retired aside")
    assert(st.read(path, "delta").count() == 100L)
    // vacuum sweeps a planted retired root the same way
    fs.mkdirs(new org.apache.hadoop.fs.Path(consumed + "/part=P9"))
    val actions = Maintenance.vacuum(spark, path)
    assert(actions.exists(a => a.kind == "delete" &&
      a.target.endsWith("__graft_partaside__consumed")), s"$actions")
    assert(!Fs.exists(spark, consumed))
  }
}
