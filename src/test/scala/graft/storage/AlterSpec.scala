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
}
