package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CLONE ([[Clone.table]]): an independent managed table from a
  * source snapshot — content and contract travel, history and feed
  * do not, and neither side's later mutations touch the other. */
class CloneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  /** A partitioned managed source with one captured merge, so it has
    * a real layout, history, and change feed to (not) clone. */
  private def mkSource(prefix: String): String = {
    val path = tempDir(prefix) + "/src"
    val rows = (1L to 30L).map(i => (i, s"p${i % 3}", i * 10.0))
    st.write(rows.toDF("id", "k", "v").repartition(col("k")),
      path, "delta", "overwrite", Seq("k"))
    st.merge((1L to 10L).map(i => (i, s"p${i % 3}", i * 10.0 + 1.0))
        .toDF("id", "k", "v"),
      path, "full.id = incremental.id", partitionFields = Seq("k"),
      captureChanges = true)
    path
  }

  test("current clone: equal content, carried partitioning and " +
      "physical layout, fresh history with a CLONE record, no feed") {
    val src = mkSource("clone_basic")
    val dst = tempDir("clone_basic_dst") + "/dst"
    Clone.table(spark, st, src, dst)
    assertDfEqual(st.read(dst, "delta"), st.read(src, "delta"))
    assert(GraftLog.isManagedTable(spark, dst))
    assert(GraftLog.lastPartitioning(spark, dst) == Seq("k"),
      "the recorded partitioning must travel")
    assert(Fs.listSubdirs(spark, dst).exists(_.startsWith("k=")),
      "the physical partition layout must travel")
    assert(!Merge.hasChanges(spark, dst),
      "the change feed is the source's timeline — it must NOT travel")
    val ops = GraftLog.history(spark, dst)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("CLONE") && !ops.contains("MERGE"),
      s"fresh history with a CLONE record, not the source's: $ops")
    val prov = GraftLog.history(spark, dst)
      .filter(col("operation") === "CLONE")
      .select("txn_app", "txn_batch").head()
    assert(prov.getString(0) == Clone.ProvenanceApp + src)
    assert(prov.getLong(1) == -1L, "-1 marks a current-content clone")
  }

  test("independence both directions: neither side's mutations reach " +
      "the other") {
    val src = mkSource("clone_indep")
    val dst = tempDir("clone_indep_dst") + "/dst"
    Clone.table(spark, st, src, dst)
    val snapshot = st.read(src, "delta").collect().map(_.toString).sorted
    Delete.where(spark, st, src, "id <= 5")
    assert(st.read(dst, "delta").collect().map(_.toString).sorted.toSeq
        == snapshot.toSeq,
      "a source mutation after the clone must not reach the clone")
    Delete.where(spark, st, dst, "id > 25")
    assert(st.read(src, "delta").filter(col("id") > 25).count() == 5,
      "a clone mutation must not reach the source")
  }

  test("as-of clone reproduces the stamped snapshot exactly") {
    val src = mkSource("clone_asof")
    // a second captured merge, so the first stamp is genuinely historic
    st.merge(Seq((100L, "p1", 999.0)).toDF("id", "k", "v"), src,
      "full.id = incremental.id", partitionFields = Seq("k"),
      captureChanges = true)
    val stamps = Merge.changeFeed(spark, src).select("batch")
      .distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 2)
    val dst = tempDir("clone_asof_dst") + "/dst"
    Clone.table(spark, st, src, dst, asOfBatch = Some(stamps.head),
      keyCols = Seq("id"))
    assertDfEqual(st.read(dst, "delta"),
      Merge.readAsOf(spark, st, src, Seq("id"), stamps.head))
    assert(st.read(dst, "delta").filter(col("id") === 100L).count() == 0,
      "the as-of clone must predate the second merge")
    val prov = GraftLog.history(spark, dst)
      .filter(col("operation") === "CLONE").select("txn_batch").head()
    assert(prov.getLong(0) == stamps.head,
      "the provenance record must carry the cloned stamp")
  }

  test("CHECK constraints travel: the clone refuses rows the source " +
      "would refuse") {
    val src = mkSource("clone_cons")
    Constraints.add(spark, st, src, "v_nonneg", "v >= 0")
    val dst = tempDir("clone_cons_dst") + "/dst"
    Clone.table(spark, st, src, dst)
    val bad = Seq((999L, "p0", -5.0)).toDF("id", "k", "v")
    val n = st.read(dst, "delta").count()
    intercept[Exception] { st.write(bad, dst, "delta", "append", Seq("k")) }
    assert(st.read(dst, "delta").count() == n,
      "a violating write on the clone must land nothing")
  }

  test("cloning a fully-emptied source (schema-sidecar-only) yields " +
      "a READABLE empty clone") {
    val src = tempDir("clone_empty") + "/src"
    st.write(Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "k", "v"),
      src, "delta", "overwrite")
    Delete.where(spark, st, src, "id >= 0") // empties the table
    assert(st.read(src, "delta").count() == 0,
      "the emptied source must stay readable via its schema sidecar")
    val dst = tempDir("clone_empty_dst") + "/dst"
    Clone.table(spark, st, src, dst)
    val out = st.read(dst, "delta")
    assert(out.count() == 0,
      "the clone of an emptied table must be readable and empty")
    assert(out.schema.fieldNames.toSeq == Seq("id", "k", "v"),
      "the clone must carry the emptied source's schema")
  }

  test("refusals: existing destination, MoR tombstones, as-of without " +
      "keys, non-managed source") {
    val src = mkSource("clone_refuse")
    val dst = tempDir("clone_refuse_dst") + "/dst"
    Clone.table(spark, st, src, dst)
    intercept[IllegalArgumentException] {
      Clone.table(spark, st, src, dst) // dst exists
    }
    intercept[IllegalArgumentException] {
      Clone.table(spark, st, src, dst + "2", asOfBatch = Some(0L)) // no keys
    }
    intercept[IllegalArgumentException] {
      Clone.table(spark, st, tempDir("clone_unmanaged"), dst + "3")
    }
    MorDelete.deleteWhere(spark, st, src, "id = 20", Seq("id"))
    val e = intercept[IllegalStateException] {
      Clone.table(spark, st, src, dst + "4")
    }
    assert(e.getMessage.contains("compact"),
      s"the MoR refusal must name the fix: ${e.getMessage}")
  }

  test("two concurrent clones to one fresh destination: exactly one " +
      "winner, the loser refuses loudly, no interleaved files") {
    val src = mkSource("clone_race")
    val expected = st.read(src, "delta").collect().map(_.toString).sorted
    for (round <- 1 to 3) {
      val dst = tempDir(s"clone_race_dst$round") + "/dst"
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var failure: Throwable = null
      def runner() = new Thread(() => {
        try { Clone.table(spark, st, src, dst); outcomes.add("ok") }
        catch {
          case _: ConcurrentWriteException => outcomes.add("refused")
          case _: IllegalArgumentException => outcomes.add("refused")
          case t: Throwable => failure = t
        }
      })
      val a = runner(); val b = runner()
      a.start(); b.start(); a.join(); b.join()
      if (failure != null) throw failure
      import scala.jdk.CollectionConverters._
      assert(outcomes.asScala.count(_ == "ok") == 1,
        s"exactly one clone must win the claim: $outcomes")
      // the winner's clone is complete and correct — no interleaving
      assert(st.read(dst, "delta").collect().map(_.toString).sorted
        .toSeq == expected.toSeq)
      assert(GraftLog.history(spark, dst)
        .filter(col("operation") === "CLONE").count() == 1L,
        "exactly one CLONE provenance row — not two interleaved ones")
      assert(!Fs.exists(spark, dst + "__graft_tmp"),
        "no staging debris after the race")
      assert(!Fs.exists(spark, Txn.lockPath(dst)),
        "the creation claim must not outlive the clone")
    }
  }

  test("a constraint added to the source mid-clone-window is " +
      "re-validated against the CLONED snapshot: violating clone " +
      "refuses and leaves nothing") {
    val path = tempDir("clone_skew") + "/src"
    // v1 contains a row a FUTURE constraint will forbid
    st.write((1L to 10L).map(i => (i, i * 10.0)).toDF("id", "v")
      .union(Seq((999L, -5.0)).toDF("id", "v")), path, "delta", "overwrite")
    // captured merge: stamp1's snapshot still holds the bad row
    st.merge(Seq((1L, 11.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp1 = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    // the source then deletes its violating row and adds the
    // constraint — valid THERE (validated against the newer snapshot)
    st.merge(Seq((999L, -5.0)).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true,
      updateCondition = Some("false"), insertCondition = Some("false"),
      deleteCondition = Some("true"))
    Constraints.add(spark, st, path, "v_nonneg", "v >= 0")
    // an as-of clone of stamp1 reconstructs the bad row under the
    // carried constraint — exactly the mid-clone skew: data snapshot
    // older than the constraints snapshot. Must refuse, not carry a
    // CHECK its own content violates.
    val dst = tempDir("clone_skew_dst") + "/dst"
    val e = intercept[IllegalStateException] {
      Clone.table(spark, st, path, dst, asOfBatch = Some(stamp1),
        keyCols = Seq("id"))
    }
    assert(e.getMessage.contains("v_nonneg"),
      s"the refusal must name the violated constraint: ${e.getMessage}")
    assert(!Fs.exists(spark, dst) && !Fs.exists(spark, dst + "__graft_tmp"),
      "a refused clone must leave no destination and no staging")
    // and the consistent clone (current content) still lands
    Clone.table(spark, st, path, dst)
    assert(st.read(dst, "delta").filter(col("v") < 0).count() == 0)
    assert(Constraints.list(spark, dst).map(_._1) == Seq("v_nonneg"),
      "the constraint travels with the consistent clone")
  }
}
