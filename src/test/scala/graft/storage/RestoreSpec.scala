package graft.storage

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** RESTORE ([[Restore.toStamp]]): roll a managed table back to a
  * time-travel stamp as a captured, replayable, travel-preserving
  * mutation — Delta's RESTORE analogue on the managed-parquet engine. */
class RestoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v").as[(Long, String)].collect().sorted.toSeq

  /** base {1a 2b 3c} → captured merge1 (2→B2, +4d) → captured merge2
    * (delete 1, 4→D3, +5e); returns (path, betweenState, stamps). */
  private def lifecycle(tag: String): (String, Seq[(Long, String)], Array[Long]) = {
    val path = tempDir(tag) + "/t"
    st.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val between = snap(st.read(path, "delta"))
    st.merge(Seq((1L, "x"), (4L, "D3"), (5L, "e")).toDF("id", "v"), path,
      "full.id = incremental.id",
      deleteCondition = Some("incremental.v = 'x'"),
      captureChanges = true)
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 2)
    (path, between, stamps)
  }

  test("restore returns the table to the as-of state and captures a " +
      "committed, replica-replayable change batch") {
    val (path, between, stamps) = lifecycle("restore_basic")
    val afterMerge2 = snap(st.read(path, "delta"))
    val rs = Restore.toStamp(spark, st, path, Seq("id"), stamps.head)
    assert(rs.nonEmpty && rs.get > stamps.last,
      "the restore batch extends the timeline")
    assert(snap(st.read(path, "delta")) == between)
    // the batch is committed (marker AFTER the rewrite, merge ordering)
    assert(Fs.exists(spark, s"$path/${Merge.ChangesDirName}/" +
      s"batch=${rs.get}/${Merge.ChangesCommitMarker}"))
    // a replica sitting at the pre-restore state replays the restore
    // batch and lands exactly on the restored table
    val replica = afterMerge2.toDF("id", "v")
    val batch = Merge.changeFeed(spark, path)
      .filter(col("batch") === rs.get)
    assert(snap(Merge.replayChanges(replica, batch, Seq("id")))
      == between)
    // change-type census: merge2 deleted 1, updated 4, inserted 5 —
    // the restore inverts that as insert 1, update 4 back, delete 5
    val kinds = batch.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(kinds == Map("insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L), kinds.toString)
  }

  test("time travel keeps serving ACROSS a restore — including the " +
      "states the restore undid") {
    val (path, between, stamps) = lifecycle("restore_travel")
    val afterMerge2 = snap(st.read(path, "delta"))
    val rs = Restore.toStamp(spark, st, path, Seq("id"), stamps.head).get
    def asOf(s: Long) = snap(Merge.readAsOf(spark, st, path, Seq("id"), s))
    assert(asOf(Long.MinValue) == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "before everything: the original write")
    assert(asOf(stamps.head) == between, "the restored-to state")
    assert(asOf(stamps.last) == afterMerge2,
      "the UNDONE state is still reconstructible — restore extends " +
        "history, never rewrites it")
    assert(asOf(rs) == between, "the restore's own stamp is current")
  }

  test("uncaptured restore fences time travel like any uncaptured " +
      "mutation") {
    val (path, _, stamps) = lifecycle("restore_fence")
    assert(Restore.toStamp(spark, st, path, Seq("id"), stamps.head,
      captureChanges = false).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamps.head).collect()
    }
    assert(e.getMessage.contains("horizon"))
  }

  test("restore refuses loudly while a MoR tombstone sidecar exists") {
    val (path, _, stamps) = lifecycle("restore_mor")
    MorDelete.deleteWhere(spark, st, path, "v = 'B2'", Seq("id"))
    val e = intercept[IllegalStateException] {
      Restore.toStamp(spark, st, path, Seq("id"), stamps.head)
    }
    assert(e.getMessage.contains("compact"))
    // after compaction the restore proceeds (compact fences, so only
    // at-or-after-horizon targets remain servable — use the newest)
    MorDelete.compact(spark, st, path, Seq("id"))
    val horizon = (GraftLog.txnBatches(spark, path,
      Merge.ChangesBarrierApp)).max
    assert(Restore.toStamp(spark, st, path, Seq("id"), horizon).nonEmpty)
  }

  test("restore across schema evolution keeps the evolved schema " +
      "(pre-evolution rows read null) and undoes the data") {
    val path = tempDir("restore_evo") + "/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((2L, "B")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val preEvo = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).min
    // evolving captured merge adds a column
    st.merge(Seq((3L, "c", 7L)).toDF("id", "v", "extra"), path,
      "full.id = incremental.id", mergeSchemas = true,
      captureChanges = true)
    assert(st.read(path, "delta").columns.contains("extra"))
    val rs = Restore.toStamp(spark, st, path, Seq("id"), preEvo).get
    // readAsOf reconstructs DATA under the CURRENT schema (its
    // documented evolving-merge contract: pre-evolution rows read
    // null), so the restore keeps the evolved column — all-null, the
    // state those rows had at the target stamp under today's schema.
    // Schema objects are never rolled back; data is.
    val restored = st.read(path, "delta")
    assert(restored.columns.contains("extra"))
    assert(snap(restored) == Seq((1L, "a"), (2L, "B")))
    assert(restored.filter(col("extra").isNotNull).count() == 0L)
    // column sets match, so the batch is the fine-grained diff: the
    // only divergence from the target snapshot was the evolved insert
    val kinds = Merge.changeFeed(spark, path)
      .filter(col("batch") === rs)
      .select("_change_type").distinct()
      .as[String].collect().toSet
    assert(kinds == Set("delete"), kinds.toString)
  }

  test("a null-keyed row unchanged on both sides emits NO change rows " +
      "— replaying the restore batch cannot duplicate it") {
    val path = tempDir("restore_nullkey") + "/t"
    val base = Seq((Option(1L), "a"), (Option(2L), "b"),
      (Option.empty[Long], "n")).toDF("id", "v")
    st.write(base, path, "delta", "overwrite")
    // merge joins on equality, so the null-keyed row is untouched by
    // both captured merges — it must ride through the restore silently
    st.merge(Seq((3L, "c")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    st.merge(Seq((2L, "B")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    val rs = Restore.toStamp(spark, st, path, Seq("id"), stamps.head).get
    val batch = Merge.changeFeed(spark, path).filter(col("batch") === rs)
    assert(batch.filter(col("id").isNull).count() == 0L,
      "unchanged null-keyed row must not appear in the restore batch " +
        "(equality anti-joins would tag it delete+insert and replay " +
        "would duplicate it)")
    // only row 2's undo is in the batch
    assert(batch.count() == 2L &&
      batch.filter(col("id") === 2L).count() == 2L)
    val rows = st.read(path, "delta").select("id", "v")
      .as[(Option[Long], String)].collect().sortBy(_._1.getOrElse(-1L)).toSeq
    assert(rows == Seq((None, "n"), (Some(1L), "a"), (Some(2L), "b"),
      (Some(3L), "c")))
    assert(rows.count(_._1.isEmpty) == 1, "exactly one null-keyed row")
  }

  test("restore to an EMPTY snapshot leaves a readable empty table") {
    val path = tempDir("restore_empty") + "/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, "delta", "overwrite")
    // captured delete-all: the post-delete (empty) state is servable
    Delete.where(spark, st, path, "id >= 0", captureChanges = true)
    val emptyStamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).max
    // the table moves on
    st.merge(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    assert(st.read(path, "delta").count() == 2)
    // restore to the empty stamp: zero parquet files get written —
    // the schema sidecar must keep the table readable
    Restore.toStamp(spark, st, path, Seq("id"), emptyStamp)
    val out = st.read(path, "delta")
    assert(out.count() == 0, "the restored table must be empty")
    assert(out.schema.fieldNames.toSeq == Seq("id", "v"),
      "the emptied table must keep its schema")
    // and it keeps working as a table: a later merge re-populates
    st.merge(Seq((9L, "z")).toDF("id", "v"), path,
      "full.id = incremental.id")
    assert(snap(st.read(path, "delta")) == Seq((9L, "z")))
  }

  test("restore preserves the table's recorded partitioning") {
    val path = tempDir("restore_part") + "/t"
    val base = Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p1"))
      .toDF("id", "v", "part")
    st.write(base, path, "delta", "overwrite",
      partitionFields = Seq("part"))
    st.merge(Seq((2L, "B", "p2")).toDF("id", "v", "part"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).min
    st.merge(Seq((4L, "d", "p3")).toDF("id", "v", "part"), path,
      "full.id = incremental.id", captureChanges = true)
    Restore.toStamp(spark, st, path, Seq("id"), stamp)
    assert(Fs.exists(spark, s"$path/part=p1") &&
      Fs.exists(spark, s"$path/part=p2"),
      "restored layout keeps the partition directories")
    assert(!Fs.exists(spark, s"$path/part=p3"),
      "the undone insert's partition is gone from the live layout")
    assert(snap(st.read(path, "delta").select(col("id"), col("v")))
      == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("restore's COW rewrite sizes its output files: a small table " +
      "lands ONE data file, not one per partition of the persisted " +
      "replay plan") {
    val (path, between, stamps) = lifecycle("restore_sized")
    Restore.toStamp(spark, st, path, Seq("id"), stamps(0))
    assert(snap(st.read(path, "delta")) == between)
    // the replay plan's persisted partitioning (shuffle.partitions=4
    // here, spark.sql.shuffle.partitions in production) must not leak
    // into the on-disk layout: bytes << targetFileBytes => one file
    assert(Fs.dataFiles(spark, path).size == 1,
      s"expected one sized output file, got " +
        s"${Fs.dataFiles(spark, path).map(_._1)}")
  }
}
