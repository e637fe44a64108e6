package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ALTER TABLE column surgery ([[Alter]]): rename/drop as
  * copy-on-write mutations with the engine's fence, lock, and
  * sidecar disciplines. */
class AlterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  test("renameColumn rewrites data and sidecars; content equal under " +
      "the new name") {
    val path = tempDir("alter_rename") + "/t"
    st.write(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v"),
      path, "delta", "overwrite")
    Alter.renameColumn(spark, st, path, "v", "value")
    val out = st.read(path, "delta")
    assert(out.schema.fieldNames.toSeq == Seq("id", "k", "value"))
    assert(out.select("id", "value").as[(Long, Double)].collect()
      .sorted.toSeq == Seq((1L, 1.0), (2L, 2.0)))
    // still a fully working managed table afterwards
    st.merge(Seq((3L, "c", 3.0)).toDF("id", "k", "value"), path,
      "full.id = incremental.id")
    assert(st.read(path, "delta").count() == 3)
    val ops = GraftLog.history(spark, path)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("ALTER"))
  }

  test("renaming a PARTITION column rewrites the physical layout and " +
      "re-records the partitioning") {
    val path = tempDir("alter_part") + "/t"
    st.write(Seq((1L, "p0", 1.0), (2L, "p1", 2.0)).toDF("id", "k", "v"),
      path, "delta", "overwrite", Seq("k"))
    Alter.renameColumn(spark, st, path, "k", "bucket")
    assert(GraftLog.lastPartitioning(spark, path) == Seq("bucket"),
      "the recorded partitioning must follow the rename")
    assert(Fs.listSubdirs(spark, path).exists(_.startsWith("bucket=")) &&
        !Fs.listSubdirs(spark, path).exists(_.startsWith("k=")),
      "the physical layout must be rewritten under the new name")
    // a later merge recovers the layout from the op log, proving the
    // self-describing contract survived the rename
    st.merge(Seq((3L, "p0", 3.0)).toDF("id", "bucket", "v"), path,
      "full.id = incremental.id")
    assert(st.read(path, "delta").count() == 3)
  }

  test("alter refuses while the feed retains batches (replicas would " +
      "silently diverge); after a full prune it proceeds and " +
      "pre-alter stamps refuse at the fence") {
    val path = tempDir("alter_fence") + "/t"
    st.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((3L, 3.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).max
    assert(Merge.readAsOf(spark, st, path, Seq("id"), stamp)
      .count() == 3)
    // retained batches name the old schema — a replica replaying them
    // across the rename would bind a schema mix with no error
    val fe = intercept[IllegalStateException] {
      Alter.renameColumn(spark, st, path, "v", "value")
    }
    assert(fe.getMessage.contains("prune"),
      s"the refusal must name the fix: ${fe.getMessage}")
    assert(st.read(path, "delta").schema.fieldNames.contains("v"),
      "a refused alter must change nothing")
    Merge.pruneChangeFeed(spark, path, stamp)
    Alter.renameColumn(spark, st, path, "v", "value")
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp - 1).collect()
    }
    assert(e.getMessage.contains("horizon"),
      s"pre-alter stamps must refuse at the fence: ${e.getMessage}")
  }

  test("case-correcting rename works; a CHECK on a struct FIELD " +
      "blocks surgery on the struct column") {
    val path = tempDir("alter_edge") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "value"),
      path, "delta", "overwrite")
    Alter.renameColumn(spark, st, path, "value", "Value")
    assert(st.read(path, "delta").schema.fieldNames.toSeq ==
      Seq("id", "Value"))
    val path2 = tempDir("alter_struct") + "/t"
    st.write(Seq((1L, 2.0)).toDF("id", "x")
        .select(col("id"), struct(col("x")).as("s")),
      path2, "delta", "overwrite")
    Constraints.add(spark, st, path2, "sx_pos", "s.x > 0")
    val e = intercept[IllegalStateException] {
      Alter.dropColumn(spark, st, path2, "s")
    }
    assert(e.getMessage.contains("sx_pos"),
      s"a struct-field CHECK must block surgery on its column: " +
        s"${e.getMessage}")
  }

  test("dropColumn removes the column; refusals: partition column, " +
      "only column, constraint reference, tombstone key") {
    val path = tempDir("alter_drop") + "/t"
    st.write(Seq((1L, "p0", 1.0, "x"), (2L, "p1", 2.0, "y"))
        .toDF("id", "k", "v", "note"),
      path, "delta", "overwrite", Seq("k"))
    Alter.dropColumn(spark, st, path, "note")
    assert(st.read(path, "delta").schema.fieldNames.toSeq ==
      Seq("id", "v", "k")) // partition column reads last
    intercept[IllegalArgumentException] {
      Alter.dropColumn(spark, st, path, "k") // partition column
    }
    Constraints.add(spark, st, path, "v_nonneg", "v >= 0")
    val ce = intercept[IllegalStateException] {
      Alter.dropColumn(spark, st, path, "v")
    }
    assert(ce.getMessage.contains("v_nonneg"),
      s"the refusal must name the constraint: ${ce.getMessage}")
    val re = intercept[IllegalStateException] {
      Alter.renameColumn(spark, st, path, "v", "value")
    }
    assert(re.getMessage.contains("v_nonneg"))
    Constraints.drop(spark, path, "v_nonneg")
    // MoR tombstones key on id — surgery on id refuses, on v proceeds
    MorDelete.deleteWhere(spark, st, path, "v >= 2", Seq("id"))
    intercept[IllegalStateException] {
      Alter.renameColumn(spark, st, path, "id", "row_id")
    }
    Alter.renameColumn(spark, st, path, "v", "value")
    assert(MorDelete.read(spark, st, path, Seq("id"))
        .select("id").as[Long].collect().toSeq == Seq(1L),
      "non-key surgery must keep the tombstone overlay meaningful")
  }

  test("addColumn: typed nulls for existing rows, feed-compatible " +
      "(no prune needed), travel serves pre-add snapshots as null") {
    val path = tempDir("alter_add") + "/t"
    st.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((3L, 3.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).max
    // no feed refusal: an added column replays as null both ways
    Alter.addColumn(spark, st, path, "note", "string")
    val out = st.read(path, "delta")
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "note"))
    assert(out.schema("note").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.filter(col("note").isNotNull).count() == 0,
      "existing rows read null in the added column")
    // time travel still serves the pre-add stamp (nulls under the
    // current schema — the documented evolution contract)
    val asOf = Merge.readAsOf(spark, st, path, Seq("id"), stamp)
    assert(asOf.count() == 3 &&
      asOf.filter(col("note").isNotNull).count() == 0)
    // the table keeps working under the new schema
    st.merge(Seq((4L, 4.0, "fresh")).toDF("id", "v", "note"), path,
      "full.id = incremental.id")
    assert(st.read(path, "delta")
      .filter(col("note") === "fresh").count() == 1)
    intercept[IllegalArgumentException] {
      Alter.addColumn(spark, st, path, "NOTE", "string") // collision
    }
  }

  test("alter on an EMPTIED table refreshes the schema sidecar under " +
      "the new schema") {
    val path = tempDir("alter_empty") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path, "delta", "overwrite")
    Delete.where(spark, st, path, "id >= 0")
    Alter.renameColumn(spark, st, path, "v", "value")
    val out = st.read(path, "delta")
    assert(out.count() == 0 &&
        out.schema.fieldNames.toSeq == Seq("id", "value"),
      "the emptied table must stay readable under the NEW schema")
  }

  test("alter is a locked mutation: refused while another writer " +
      "holds the commit lock") {
    val path = tempDir("alter_lock") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path, "delta", "overwrite")
    val token = Txn.acquire(spark, path, "MERGE")
    intercept[ConcurrentWriteException] {
      Alter.renameColumn(spark, st, path, "v", "value")
    }
    Txn.release(spark, path, token)
    Alter.renameColumn(spark, st, path, "v", "value")
    assert(st.read(path, "delta").schema.fieldNames.contains("value"))
  }

  /** (path, size, mtime) of every data file — the ZERO-REWRITE proof
    * for metadata-only alters. */
  private def fileFingerprint(path: String): Seq[(String, Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Fs.dataFiles(spark, path).map { case (p, len) =>
      (p, len, fs.getFileStatus(new org.apache.hadoop.fs.Path(p))
        .getModificationTime)
    }.sortBy(_._1)
  }

  test("metadata-only rename/drop: zero data files touched, logical " +
      "schema and values correct, later mutations write consistently") {
    val path = tempDir("alter_mapped") + "/t"
    st.write(Seq((1L, "a", 1.0, "x"), (2L, "b", 2.0, "y"))
      .toDF("id", "k", "v", "junk"), path, "delta", "overwrite")
    val before = fileFingerprint(path)
    Alter.renameColumnMetadata(spark, st, path, "v", "value")
    Alter.dropColumnMetadata(spark, st, path, "junk")
    assert(fileFingerprint(path) == before,
      "a metadata alter must not touch a single data file")
    val out = st.read(path, "delta")
    assert(out.schema.fieldNames.toSeq == Seq("id", "k", "value"))
    assert(out.select("id", "value").as[(Long, Double)].collect()
      .sorted.toSeq == Seq((1L, 1.0), (2L, 2.0)))
    // a merge AFTER the mapped alter writes physical names: the new
    // file and the old files must read back as one consistent table
    st.merge(Seq((2L, "b2", 20.0), (3L, "c", 3.0))
      .toDF("id", "k", "value"), path, "full.id = incremental.id")
    assert(st.read(path, "delta").select("id", "k", "value")
      .as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    // the mapping rides the merge's COW swap
    assert(ColumnMapping.load(spark, path).nonEmpty,
      "the mapping sidecar must survive a COW rewrite")
    // appends and deletes keep working in logical space
    st.write(Seq((4L, "d", 4.0)).toDF("id", "k", "value"),
      path, "delta", "append")
    assert(Delete.where(spark, st, path, "value >= 20.0") == 1L)
    assert(st.read(path, "delta").select("id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 3L, 4L))
    // constraints bind to the logical name
    Constraints.add(spark, st, path, "value_pos", "value > 0")
    intercept[Exception] {
      st.write(Seq((9L, "z", -1.0)).toDF("id", "k", "value"),
        path, "delta", "append")
    }
  }

  test("mapped rename chains collapse to the original physical name; " +
      "a rename back to it clears the mapping; NAME SWAPS through the " +
      "mapping are refused (they would break idempotency)") {
    val path = tempDir("alter_mapped_chain") + "/t"
    st.write(Seq((1L, 10.0, 100.0)).toDF("id", "a", "b"),
      path, "delta", "overwrite")
    // chain a→t→u stores ONE entry a→u, never a t hop
    Alter.renameColumnMetadata(spark, st, path, "a", "t")
    Alter.renameColumnMetadata(spark, st, path, "t", "u")
    assert(ColumnMapping.load(spark, path).get.renames == Map("a" -> "u"))
    assert(st.read(path, "delta").select("u").as[Double].head() == 10.0)
    // renaming ONTO another column's occupied physical (the a/b swap
    // move) refuses — old files could not tell the two "a"s apart
    val e = intercept[IllegalStateException] {
      Alter.renameColumnMetadata(spark, st, path, "b", "a")
    }
    assert(e.getMessage.contains("materializeMapping"))
    // renaming BACK to the column's own physical name is the identity
    // case: allowed, and the sidecar disappears entirely
    Alter.renameColumnMetadata(spark, st, path, "u", "a")
    assert(ColumnMapping.load(spark, path).isEmpty,
      "identity mapping must remove the sidecar, not store a no-op")
    assert(st.read(path, "delta").select("a", "b")
      .as[(Double, Double)].head() == ((10.0, 100.0)))
  }

  test("mapped-alter refusals: partition column, occupied physical " +
      "names, retained feed; materializeMapping is the escape hatch") {
    val path = tempDir("alter_mapped_refuse") + "/t"
    st.write(Seq((1L, "p0", 1.0, 9L)).toDF("id", "k", "v", "old"),
      path, "delta", "overwrite", Seq("k"))
    // partition column: metadata rename would orphan the k= dirs
    val e1 = intercept[IllegalArgumentException] {
      Alter.renameColumnMetadata(spark, st, path, "k", "bucket")
    }
    assert(e1.getMessage.contains("COW"),
      s"must point at the COW flavor: ${e1.getMessage}")
    // occupied names: after drop(old) + rename(v→price), neither
    // "old" nor "v" may return as a logical column — old files still
    // carry those physical names and would disagree about meaning
    Alter.dropColumnMetadata(spark, st, path, "old")
    Alter.renameColumnMetadata(spark, st, path, "v", "price")
    // a DIFFERENT column renamed onto an occupied physical refuses
    // (renaming price back to its own physical "v" would be the
    // allowed identity case — this is id onto dropped "old")
    val e2 = intercept[IllegalStateException] {
      Alter.renameColumnMetadata(spark, st, path, "id", "old")
    }
    assert(e2.getMessage.contains("materializeMapping"))
    // merge schema evolution hits the same wall: it keeps the mapping
    // and writes physical names, so the new column would collide
    // inside its own write projection
    intercept[IllegalStateException] {
      st.merge(Seq((1L, "p0", 1.0, "zz")).toDF("id", "k", "price", "old"),
        path, "full.id = incremental.id", partitionFields = Seq("k"),
        mergeSchemas = true)
    }
    // materialize: one COW rewrite clears the mapping and frees the
    // names — and the content is unchanged through it
    val pre = st.read(path, "delta").collect().map(_.toString).sorted
    assert(Alter.materializeMapping(spark, st, path))
    assert(ColumnMapping.load(spark, path).isEmpty)
    assert(st.read(path, "delta").collect().map(_.toString).sorted
      .toSeq == pre.toSeq)
    assert(!Alter.materializeMapping(spark, st, path),
      "materializing twice must report nothing to do")
    Alter.addColumn(spark, st, path, "old", "string")
    assert(st.read(path, "delta").schema.fieldNames.contains("old"))
    // retained feed refuses the mapped flavor like the COW one
    val path2 = tempDir("alter_mapped_feed") + "/t"
    st.write(Seq((1L, 1.0)).toDF("id", "v"), path2, "delta", "overwrite")
    st.merge(Seq((2L, 2.0)).toDF("id", "v"), path2,
      "full.id = incremental.id", captureChanges = true)
    intercept[IllegalStateException] {
      Alter.renameColumnMetadata(spark, st, path2, "v", "value")
    }
  }

  test("a COW surgery on a MAPPED table materializes the mapping as " +
      "part of its rewrite — the surgery lands instead of being " +
      "silently undone by the carried sidecar") {
    val path = tempDir("alter_cow_on_mapped") + "/t"
    st.write(Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "v", "s"),
      path, "delta", "overwrite")
    Alter.renameColumnMetadata(spark, st, path, "v", "val2")
    // COW rename of the MAPPED column: were the staged frame projected
    // back to physical names, the carried {v→val2} sidecar would
    // re-alias the files to val2 on the next read — a full rewrite
    // that changed nothing
    Alter.renameColumn(spark, st, path, "val2", "v2")
    assert(ColumnMapping.load(spark, path).isEmpty,
      "a COW rewrite replaces every file — the mapping must clear")
    val out = st.read(path, "delta")
    assert(out.schema.fieldNames.toSeq == Seq("id", "v2", "s"),
      s"the COW rename must LAND: ${out.schema.fieldNames.toSeq}")
    assert(out.select("id", "v2").as[(Long, Double)].collect()
      .sorted.toSeq == Seq((1L, 1.0), (2L, 2.0)))
    // COW addColumn of a previously-occupied name: the rewrite frees
    // it (every old file replaced), so no refusal is needed
    Alter.renameColumnMetadata(spark, st, path, "s", "s2")
    Alter.addColumn(spark, st, path, "s", "string")
    assert(ColumnMapping.load(spark, path).isEmpty)
    assert(st.read(path, "delta").schema.fieldNames.toSeq ==
      Seq("id", "v2", "s2", "s"))
  }

  test("mapped alter fences time travel and keeps streaming reads " +
      "and data skipping correct in logical space") {
    val path = tempDir("alter_mapped_travel") + "/t"
    st.write((1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((1L, 11.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    Merge.pruneChangeFeed(spark, path, stamp)
    Alter.renameColumnMetadata(spark, st, path, "v", "value")
    // pruned-era stamps refuse below the alter (the fence), exactly
    // like the COW flavor
    intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp - 1).collect()
    }
    // a file stream over the mapped table must see LOGICAL names with
    // the RIGHT values (the probe must be physical — a logical probe
    // would read the renamed column as null)
    val stream = st.readStream(path, "delta")
    assert(stream.schema.fieldNames.toSeq == Seq("id", "value"))
    val q = stream.writeStream.format("memory")
      .queryName("alter_mapped_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("alter_mapped_stream")
      .select("id", "value").as[(Long, Double)].collect().toMap
    assert(got(1L) == 11.0 && got(2L) == 2.0 && got.size == 20,
      s"the stream must read the renamed column's VALUES: $got")
    // data skipping: stats collected pre-rename (physical names) must
    // still prune correctly for logical predicates post-rename
    DataSkipping.collectStats(spark, path, Seq("value"))
    val pruned = DataSkipping.prunedRead(spark, path, "value",
      Some(11.0), Some(11.0))
    assert(pruned.schema.fieldNames.toSeq == Seq("id", "value"))
    // both 11.0 rows: id=11 (original) and id=1 (merged update)
    assert(pruned.filter(col("value") === 11.0).select("id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 11L))
  }
}
