package graft.storage

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Ports of the merge cases in test/storage/test_basic.py:112-257. */
class MergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def storage = new BasicStorage(spark)

  test("merge: insert/update conditions and kept rows") {
    val dir = tempDir("merge1")
    Fs.delete(spark, dir)
    val df = Seq((1L, "existing"), (2L, "existing"), (3L, "existing"))
      .toDF("id", "value")
    storage.write(df, dir, "delta", "overwrite")
    val incremental =
      Seq((2L, "updated"), (3L, "updated"), (4L, "added"), (5L, "added"))
        .toDF("id", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      insertCondition = Some("incremental.id != 4"),
      updateCondition = Some("incremental.id != 2"))
    val expected =
      Seq((1L, "existing"), (2L, "existing"), (3L, "updated"), (5L, "added"))
        .toDF("id", "value")
    assertDfEqual(storage.read(dir, "delta"), expected)
  }

  test("merge: schema changes fail unless mergeSchemas") {
    val dir = tempDir("merge2")
    Fs.delete(spark, dir)
    val df = Seq((1L, "existing", 1L), (2L, "existing", 1L), (3L, "existing", 1L))
      .toDF("id", "value", "old")
    storage.write(df, dir, "delta", "overwrite")
    val incremental = Seq((3L, "updated", 2L), (4L, "added", 2L))
      .toDF("id", "value", "new")
    intercept[IllegalArgumentException] {
      storage.merge(incremental, dir, "full.id == incremental.id")
    }
    storage.merge(incremental, dir, "full.id == incremental.id",
      mergeSchemas = true)
    val expected = Seq(
      (1L, "existing", Some(1L), None),
      (2L, "existing", Some(1L), None),
      (3L, "updated", None, Some(2L)),
      (4L, "added", None, Some(2L))
    ).toDF("id", "value", "old", "new")
    assertDfEqual(
      storage.read(dir, "delta").select("id", "value", "old", "new"), expected)
  }

  test("merge: ignore updates (update_condition=false)") {
    val dir = tempDir("merge3")
    Fs.delete(spark, dir)
    val df = Seq((1L, "existing"), (2L, "existing"), (3L, "existing"))
      .toDF("id", "value")
    storage.write(df, dir, "delta", "overwrite")
    val incremental = Seq((3L, "updated"), (4L, "added")).toDF("id", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      updateCondition = Some("false"))
    val expected =
      Seq((1L, "existing"), (2L, "existing"), (3L, "existing"), (4L, "added"))
        .toDF("id", "value")
    assertDfEqual(storage.read(dir, "delta"), expected)
  }

  test("merge: ignore inserts (insert_condition=false)") {
    val dir = tempDir("merge4")
    Fs.delete(spark, dir)
    val df = Seq((1L, "existing"), (2L, "existing"), (3L, "existing"))
      .toDF("id", "value")
    storage.write(df, dir, "delta", "overwrite")
    val incremental = Seq((3L, "updated"), (4L, "added")).toDF("id", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      insertCondition = Some("false"))
    val expected =
      Seq((1L, "existing"), (2L, "existing"), (3L, "updated"))
        .toDF("id", "value")
    assertDfEqual(storage.read(dir, "delta"), expected)
  }

  test("merge: both conditions false is an error") {
    intercept[IllegalArgumentException] {
      storage.merge(null, "", "",
        insertCondition = Some("false"), updateCondition = Some("false"))
    }
  }

  test("merge: auto-creates missing table") {
    val dir = tempDir("merge5") + "/nested/table"
    val incremental = Seq((1L, "a")).toDF("id", "value")
    storage.merge(incremental, dir, "full.id == incremental.id")
    assertDfEqual(storage.read(dir, "delta"), incremental)
    assert(GraftLog.isManagedTable(spark, dir))
  }

  test("merge: non-managed path is rejected") {
    val dir = tempDir("merge6")
    val df = Seq((1L, "a")).toDF("id", "value")
    storage.write(df, dir, "parquet", "overwrite")
    intercept[IllegalArgumentException] {
      storage.merge(df, dir, "full.id == incremental.id")
    }
  }

  test("merge: partitioned table rewrites only affected partitions") {
    import org.apache.spark.sql.functions.col
    val dir = tempDir("merge_part")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "A", "v1"), (3L, "B", "v1"),
      (4L, "C", "v1")).toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))

    def partFiles(p: String): Set[String] =
      new java.io.File(s"$dir/part=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val bFilesBefore = partFiles("B")
    val cFilesBefore = partFiles("C")

    // touches partition A (update id=2) and D (insert id=5)
    val incremental = Seq((2L, "A", "v2"), (5L, "D", "v2"))
      .toDF("id", "part", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      partitionFields = Seq("part"))

    val expected = Seq((1L, "A", "v1"), (2L, "A", "v2"), (3L, "B", "v1"),
      (4L, "C", "v1"), (5L, "D", "v2")).toDF("id", "part", "value")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "value"),
      expected)
    // untouched partitions keep their exact files
    assert(partFiles("B") == bFilesBefore)
    assert(partFiles("C") == cFilesBefore)
    assert(new java.io.File(s"$dir/part=D").exists())
  }

  test("merge: partitioned update moving a row across partitions") {
    val dir = tempDir("merge_move")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "B", "v1")).toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))
    // id=2 moves from partition B to partition C
    val incremental = Seq((2L, "C", "v2")).toDF("id", "part", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      partitionFields = Seq("part"))
    val expected = Seq((1L, "A", "v1"), (2L, "C", "v2"))
      .toDF("id", "part", "value")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "value"),
      expected)
  }

  test("merge: schema evolution on a partitioned table keeps every partition") {
    val dir = tempDir("merge_evolve_part")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "B", "v1"), (3L, "C", "v1"))
      .toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))
    // incremental with a NEW column touches only partition A
    val incremental = Seq((1L, "A", "v2", 9L)).toDF("id", "part", "value", "extra")
    storage.merge(incremental, dir, "full.id == incremental.id",
      partitionFields = Seq("part"), mergeSchemas = true)
    val out = storage.read(dir, "delta")
    // partitions B and C must survive the evolving rewrite
    assert(out.count() == 3, s"rows lost: ${out.collect().mkString}")
    assert(out.filter(col("part").isin("B", "C")).count() == 2)
    assert(out.filter(col("id") === 1).head().getAs[Long]("extra") == 9L)
  }

  test("merge: null partition value emptied by a move is cleaned up") {
    val dir = tempDir("merge_nullpart")
    Fs.delete(spark, dir)
    val df = Seq((1L, Option.empty[String], "v1"), (2L, Some("B"), "v1"))
      .toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))
    assert(new java.io.File(s"$dir/part=__HIVE_DEFAULT_PARTITION__").exists())
    // id=1 moves out of the null partition
    val incremental = Seq((1L, Some("B"), "v2")).toDF("id", "part", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      partitionFields = Seq("part"))
    val out = storage.read(dir, "delta").select("id", "part", "value")
    assertDfEqual(out,
      Seq((1L, Some("B"), "v2"), (2L, Some("B"), "v1")).toDF("id", "part", "value"))
    assert(!new java.io.File(s"$dir/part=__HIVE_DEFAULT_PARTITION__").exists(),
      "stale null-partition directory survived")
  }

  test("merge: recorded partitioning used when caller omits it") {
    val dir = tempDir("merge_selfdesc")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "B", "v1")).toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))
    assert(GraftLog.lastPartitioning(spark, dir) == Seq("part"))
    // merge WITHOUT partitionFields — layout must be preserved from log
    storage.merge(Seq((3L, "C", "v2")).toDF("id", "part", "value"),
      dir, "full.id == incremental.id")
    assert(new java.io.File(s"$dir/part=C").exists(),
      "partition layout lost on self-described merge")
    assert(storage.read(dir, "delta").count() == 3)
    assert(GraftLog.lastPartitioning(spark, dir) == Seq("part"))
  }

  test("merge: multi-column partitions with escape-needing values") {
    val dir = tempDir("merge_multipart")
    Fs.delete(spark, dir)
    // partition values containing spaces and colons need path escaping
    val df = Seq(
      (1L, "region a", "2024:01", "v1"),
      (2L, "region a", "2024:02", "v1"),
      (3L, "region b", "2024:01", "v1")).toDF("id", "region", "month", "value")
    storage.write(df, dir, "delta", "overwrite",
      partitionFields = Seq("region", "month"))
    // id=2 moves from (region a, 2024:02) to (region b, 2024:02):
    // its old two-level partition must be emptied and cleaned
    val incremental = Seq((2L, "region b", "2024:02", "v2"))
      .toDF("id", "region", "month", "value")
    storage.merge(incremental, dir, "full.id == incremental.id",
      partitionFields = Seq("region", "month"))
    val expected = Seq(
      (1L, "region a", "2024:01", "v1"),
      (2L, "region b", "2024:02", "v2"),
      (3L, "region b", "2024:01", "v1")).toDF("id", "region", "month", "value")
    assertDfEqual(
      storage.read(dir, "delta").select("id", "region", "month", "value"),
      expected)
    // emptied nested partition dir cleaned up (escaped path)
    val emptied = new java.io.File(s"$dir/region=region a/month=2024%3A02")
    assert(!emptied.exists(), s"emptied partition dir not cleaned: $emptied")
  }

  test("merge: observers notified exactly once, auto-create included") {
    val st = storage
    var notifications = 0
    st.registerOutputObserver((_, _) => notifications += 1)
    val dir = tempDir("merge_obs") + "/t"
    val df = Seq((1L, "a")).toDF("id", "value")
    st.merge(df, dir, "full.id == incremental.id") // auto-create -> write path
    assert(notifications == 1)
    st.merge(Seq((2L, "b")).toDF("id", "value"), dir,
      "full.id == incremental.id") // real merge
    assert(notifications == 2)
  }

  test("merge: history records MERGE after WRITE") {
    val dir = tempDir("merge7")
    Fs.delete(spark, dir)
    val df = Seq((1L, "a")).toDF("id", "value")
    storage.write(df, dir, "delta", "overwrite")
    storage.merge(Seq((2L, "b")).toDF("id", "value"), dir,
      "full.id == incremental.id")
    val ops = GraftLog.history(spark, dir).select("operation")
      .as[String].collect().toSeq
    assert(ops == Seq("MERGE", "WRITE"))
  }

  test("merge: partition field pinned by the condition skips nothing it needs") {
    // condition pins part equal across sides -> the matched-partitions
    // semi-join is skipped; result must still be exactly right, and
    // untouched partitions must keep their files
    val dir = tempDir("merge_pinned")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "A", "v1"), (3L, "B", "v1"))
      .toDF("id", "part", "value")
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("part"))
    def bFiles: Set[String] =
      new java.io.File(s"$dir/part=B").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = bFiles
    val incremental = Seq((2L, "A", "v2"), (4L, "C", "v2"))
      .toDF("id", "part", "value")
    storage.merge(incremental, dir,
      "full.part == incremental.part AND full.id == incremental.id",
      partitionFields = Seq("part"))
    val expected = Seq((1L, "A", "v1"), (2L, "A", "v2"), (3L, "B", "v1"),
      (4L, "C", "v2")).toDF("id", "part", "value")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "value"),
      expected)
    assert(bFiles == before)
  }

  test("merge: partition field casing differs from the column - still works") {
    val dir = tempDir("merge_casing")
    Fs.delete(spark, dir)
    val df = Seq((1L, "A", "v1"), (2L, "B", "v1")).toDF("id", "part", "value")
    // caller states the partition field with different casing than the
    // schema; Spark's partitionBy resolves it, and so must the merge
    storage.write(df, dir, "delta", "overwrite", partitionFields = Seq("PART"))
    storage.merge(Seq((2L, "B", "v2"), (3L, "C", "v2"))
      .toDF("id", "part", "value"), dir,
      "full.part == incremental.part AND full.id == incremental.id",
      partitionFields = Seq("PART"))
    val got = storage.read(dir, "delta").select("id", "value")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v2"))
  }

  test("merge: caller casing diverges from on-disk dirs - no sibling dirs") {
    val dir = tempDir("merge_casing2")
    Fs.delete(spark, dir)
    // table written lowercase -> physical dirs part=A / part=B
    storage.write(Seq((1L, "A", "v1"), (2L, "B", "v1"))
      .toDF("id", "part", "value"), dir, "delta", "overwrite",
      partitionFields = Seq("part"))
    // merge states the field uppercase; the rewrite must target the
    // EXISTING part= dirs, not create sibling PART= dirs with stale
    // rows left behind
    storage.merge(Seq((2L, "B", "v2")).toDF("id", "part", "value"), dir,
      "full.id == incremental.id", partitionFields = Seq("PART"))
    assert(!new java.io.File(s"$dir/PART=B").exists())
    val got = storage.read(dir, "delta").select("id", "value")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "v1", 2L -> "v2"))
  }

  test("merge: small incremental broadcasts; the table is never shuffled") {
    val dir = tempDir("merge_broadcast")
    Fs.delete(spark, dir)
    val big = spark.range(0, 5000).toDF("id")
      .withColumn("value", col("id").cast("string"))
    storage.write(big, dir, "delta", "overwrite")

    val plans = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val inc = Seq((1L, "u"), (9999L, "n")).toDF("id", "value")
      storage.merge(inc, dir, "full.id == incremental.id")
      // listener delivery is async — poll for the write's plan
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def all = {
        import scala.jdk.CollectionConverters._
        plans.asScala.mkString("\n===\n")
      }
      while (!all.contains("BroadcastHashJoin") &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(all.contains("BroadcastHashJoin"),
        s"table-side merge joins did not broadcast:\n$all")
      assert(!all.contains("SortMergeJoin"),
        s"merge shuffled the table for a 2-row incremental:\n$all")
    } finally spark.listenerManager.unregister(listener)
    val got = storage.read(dir, "delta")
    assert(got.count() == 5001)
    assert(got.filter(col("id") === 1L).head().getString(1) == "u")
  }

  test("merge: multiple incremental matches duplicate the full row per pair") {
    // Delta errors on multi-match; we document per-pair duplication —
    // the decomposed plan must reproduce the full-outer pair semantics
    // exactly, including a mixed update/keep split across the pairs.
    val dir = tempDir("merge_multimatch")
    Fs.delete(spark, dir)
    storage.write(Seq((1L, "old"), (2L, "other")).toDF("id", "value"),
      dir, "delta", "overwrite")
    val inc = Seq((1L, "upd-a"), (1L, "keep-me-not")).toDF("id", "value")
    storage.merge(inc, dir, "full.id == incremental.id",
      updateCondition = Some("incremental.value = 'upd-a'"))
    val got = storage.read(dir, "delta").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_.toString).toSeq
    // pair (1,upd-a) -> updated; pair (1,keep-me-not) -> kept copy of full
    assert(got == Seq((1L, "old"), (1L, "upd-a"), (2L, "other")).sortBy(_.toString))
  }

  test("merge: errorOnMultiMatch raises on multi-match, passes 1:1 merges") {
    val dir = tempDir("merge_multierr")
    Fs.delete(spark, dir)
    storage.write(Seq((1L, "old"), (2L, "other")).toDF("id", "value"),
      dir, "delta", "overwrite")
    // 1:1 matches pass with the flag on, and merge normally
    storage.merge(Seq((1L, "upd")).toDF("id", "value"), dir,
      "full.id == incremental.id", errorOnMultiMatch = true)
    assert(storage.read(dir, "delta").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "upd"), (2L, "other")))
    // two incremental rows hitting one table row raise; table untouched
    val inc = Seq((1L, "a"), (1L, "b")).toDF("id", "value")
    val e = intercept[IllegalStateException] {
      storage.merge(inc, dir, "full.id == incremental.id",
        errorOnMultiMatch = true)
    }
    assert(e.getMessage.contains("multiple rows"))
    assert(storage.read(dir, "delta").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "upd"), (2L, "other")))
  }

  test("merge: null keys never match — kept on full side, inserted from incremental") {
    val dir = tempDir("merge_nullkeys")
    Fs.delete(spark, dir)
    val full = Seq((Some(1L), "a"), (None, "null-full"))
      .toDF("id", "value")
    storage.write(full, dir, "delta", "overwrite")
    // two IDENTICAL null-key rows: both must insert (null-safe anti must
    // not collapse or re-match them), plus a normal update
    val inc = Seq((Some(1L), "a2"), (None, "null-inc"), (None, "null-inc"))
      .toDF("id", "value")
    storage.merge(inc, dir, "full.id == incremental.id")
    val got = storage.read(dir, "delta").collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSeq
      .sortBy(_.toString)
    assert(got == Seq(
      (Some(1L), "a2"), (None, "null-full"),
      (None, "null-inc"), (None, "null-inc")).sortBy(_.toString))
  }

  test("merge: map-typed columns merge (unorderable - hash-compared in anti)") {
    val dir = tempDir("merge_map")
    Fs.delete(spark, dir)
    val full = Seq((1L, Map("a" -> "1")), (2L, Map("b" -> "2")))
      .toDF("id", "attrs")
    storage.write(full, dir, "delta", "overwrite")
    val inc = Seq((2L, Map("b" -> "updated")), (3L, Map("c" -> "3")),
      (4L, null.asInstanceOf[Map[String, String]]))
      .toDF("id", "attrs")
    storage.merge(inc, dir, "full.id == incremental.id")
    val got = storage.read(dir, "delta").collect()
      .map(r => r.getLong(0) -> Option(r.getMap[String, String](1))
        .map(_.toString).orNull).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(2L).contains("updated"))
    assert(got(4L) == null) // null map row inserted once
  }

  test("merge: same-name different-type column is a dedicated error") {
    val dir = tempDir("merge_typeconflict")
    Fs.delete(spark, dir)
    storage.write(Seq((1L, "a")).toDF("id", "value"), dir, "delta", "overwrite")
    val incremental = Seq((2L, 42)).toDF("id", "value") // value: int, was string
    val e = intercept[IllegalArgumentException] {
      storage.merge(incremental, dir, "full.id == incremental.id",
        mergeSchemas = true)
    }
    assert(e.getMessage.contains("value"))
    assert(e.getMessage.contains("string") && e.getMessage.contains("int"))
  }

  test("time travel: one-batch hop equals the between-merges snapshot") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("tt_hop") + "/t"
    st.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().sorted.toSeq
    val between = snap(st.read(path, "delta"))
    assert(between == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    st.merge(Seq((1L, "x"), (4L, "D3"), (5L, "e")).toDF("id", "v"), path,
      "full.id = incremental.id",
      deleteCondition = Some("incremental.v = 'x'"),
      captureChanges = true)
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 2)
    // as-of the FIRST batch ⇒ the state after merge 1 / before merge 2
    assert(snap(Merge.readAsOf(spark, st, path, Seq("id"), stamps.head))
      == between)
    // as-of before everything ⇒ the original write
    assert(snap(Merge.readAsOf(spark, st, path, Seq("id"), Long.MinValue))
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // as-of the newest batch ⇒ the current table, untouched
    assert(snap(Merge.readAsOf(spark, st, path, Seq("id"), stamps.last))
      == snap(st.read(path, "delta")))
  }

  test("replayChanges is idempotent — re-applying a batch changes nothing") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("replay_idem") + "/t"
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    st.write(base, path, "delta", "overwrite")
    // batch with ALL three change kinds: update 2, delete 3, insert 4
    st.merge(Seq((2L, "B"), (3L, "x"), (4L, "d")).toDF("id", "v"), path,
      "full.id = incremental.id",
      deleteCondition = Some("incremental.v = 'x'"),
      captureChanges = true)
    val batch = Merge.changeFeed(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, String)].collect().sorted.toSeq
    val once = Merge.replayChanges(base, batch, Seq("id"))
    assert(rows(once) == Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // crash-recovery re-replay: the INSERT key must not duplicate
    val twice = Merge.replayChanges(once, batch, Seq("id"))
    assert(rows(twice) == rows(once))
  }

  test("pruneChangeFeed drops old batches; readAsOf refuses the gap") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("feed_prune") + "/t"
    st.write(Seq((1L, "a")).toDF("id", "v"), path, "delta", "overwrite")
    st.merge(Seq((2L, "b")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    st.merge(Seq((3L, "c")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 2)
    assert(Merge.pruneChangeFeed(spark, path, stamps.head) == 1L)
    // the newer batch still replays: one-hop travel works
    val hop = Merge.readAsOf(spark, st, path, Seq("id"), stamps.head)
      .as[(Long, String)].collect().sorted.toSeq
    assert(hop == Seq((1L, "a"), (2L, "b")))
    // travel past the pruned horizon fails loudly
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), Long.MinValue).collect()
    }
    assert(e.getMessage.contains("pruned change horizon"))
    // pruning everything removes the feed dir — the table reports
    // "no feed" instead of an unreadable empty dir
    assert(Merge.pruneChangeFeed(spark, path, Long.MaxValue) == 1L)
    assert(!Merge.hasChanges(spark, path))
    // the horizon guard must fire even with NO feed left — the
    // missing-feed early return cannot hand back `current` for an
    // as-of request behind the recorded horizon
    val e2 = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamps.head).collect()
    }
    assert(e2.getMessage.contains("pruned change horizon"))
    // and a later captured merge starts a fresh feed cleanly
    st.merge(Seq((4L, "d")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    assert(Merge.changeFeed(spark, path)
      .select("batch").distinct().count() == 1L)
  }

  test("readAsOf long hop: checkpointEvery bounds plan depth over 24 batches") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("tt_long") + "/t"
    st.write(Seq((0L, 0L)).toDF("id", "v"), path, "delta", "overwrite")
    // 24 captured merges: each flips one key's value and inserts one
    (1L to 24L).foreach { k =>
      st.merge(Seq((0L, k), (k, k)).toDF("id", "v"), path,
        "full.id = incremental.id", captureChanges = true)
    }
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 24)
    def depth(df: org.apache.spark.sql.DataFrame): Int = {
      def go(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
        1 + (if (p.children.isEmpty) 0 else p.children.map(go).max)
      go(df.queryExecution.optimizedPlan)
    }
    // full 24-batch hop back to just-after-batch-1
    val plain = Merge.readAsOf(spark, st, path, Seq("id"), stamps.head)
    val boundedDf = Merge.readAsOf(spark, st, path, Seq("id"), stamps.head,
      checkpointEvery = 5)
    // identical result either way: the state after merge 1
    val expect = Seq((0L, 1L), (1L, 1L))
    assert(plain.as[(Long, Long)].collect().sorted.toSeq == expect)
    assert(boundedDf.as[(Long, Long)].collect().sorted.toSeq == expect)
    // the checkpointed hop's plan is a bounded number of replay layers
    // over a materialized snapshot, NOT 23 chained anti-joins
    assert(depth(boundedDf) < depth(plain) / 2,
      s"checkpointEvery did not truncate lineage: " +
        s"bounded=${depth(boundedDf)} plain=${depth(plain)}")
  }

  test("managed overwrite: feed dropped with recorded horizon, log survives") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("over_feed") + "/t"
    st.write(Seq((1L, "a")).toDF("id", "v"), path, "delta", "overwrite")
    st.merge(Seq((2L, "b")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    val opsBefore = GraftLog.history(spark, path).count()
    // rebuild-by-overwrite: the feed cannot represent this rewrite
    st.write(Seq((9L, "z")).toDF("id", "v"), path, "delta", "overwrite")
    assert(!Merge.hasChanges(spark, path),
      "an overwritten table's change feed describes a table that is gone")
    assert(GraftLog.history(spark, path).count() > opsBefore)
    // time travel to ANY pre-overwrite state refuses loudly —
    // including as-of the newest captured batch: unlike a prune
    // (where newer retained batches can still replay), the overwrite
    // destroyed even the state just after batch `stamp`
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
    }
    assert(e.getMessage.contains("pruned change horizon"))
    // the recorded horizon is a FRESH stamp dominating every stamp
    // ever issued (not maxBatch + 1 — a barrier stamp could sit above
    // that); at and after it ⇒ the current (post-overwrite) table
    val h = GraftLog.lastTxnBatch(spark, path,
      Merge.ChangesOverwriteApp).get
    assert(h > stamp)
    assert(Merge.readAsOf(spark, st, path, Seq("id"), h)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("a post-overwrite merge stamping exactly the horizon does not heal it away") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("over_exact") + "/t"
    st.write(Seq((1L, "a")).toDF("id", "v"), path, "delta", "overwrite")
    st.merge(Seq((2L, "b")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    st.write(Seq((9L, "z")).toDF("id", "v"), path, "delta", "overwrite")
    // the recorded horizon: a fresh stamp the overwrite consumed from
    // nextBatchStamp — no same-JVM batch can collide with it anymore,
    // but the strict-inequality heal must STILL not misread a feed
    // whose min stamp lands exactly on h (clock anomalies, a foreign
    // writer) as crashed-overwrite debris; simulate that batch
    // directly: real debris (pre-overwrite stamps) is strictly below h
    val h = GraftLog.lastTxnBatch(spark, path,
      Merge.ChangesOverwriteApp).get
    Seq((10L, "w", "insert")).toDF("id", "v", "_change_type")
      .write.parquet(s"$path/${Merge.ChangesDirName}/batch=$h")
    // the horizon is GENUINE: pre-overwrite travel must still refuse
    // (a <= heal would misread it as debris and reconstruct a wrong
    // pre-overwrite snapshot from the post-overwrite table)
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamp).collect()
    }
    assert(e.getMessage.contains("pruned change horizon"))
    // as-of the horizon itself (just before the h-stamped merge):
    // serves the post-overwrite pre-merge table
    assert(Merge.readAsOf(spark, st, path, Seq("id"), h)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("captured merges across schema evolution: merged-schema feed, " +
      "travel, and replica replay that evolves with the batch") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("evo_cdf") + "/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((3L, "c")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val s1 = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    // the replica bootstraps from the post-batch-1 snapshot (old
    // schema) — the replication contract
    val replica = tempDir("evo_cdf_r") + "/t"
    st.write(st.read(path, "delta"), replica, "delta", "overwrite")
    // evolving captured merge: adds column w
    st.merge(Seq((2L, "B", 7L), (4L, "d", 9L)).toDF("id", "v", "w"),
      path, "full.id = incremental.id", mergeSchemas = true,
      captureChanges = true)
    val s2 = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).max
    // the feed serves BOTH batches under the MERGED schema — without
    // mergeSchema an old batch's footer could silently drop w from
    // the evolving batch's changes
    val feed = Merge.changeFeed(spark, path)
    assert(feed.schema.fieldNames.contains("w"))
    assert(feed.filter(col("batch") === s1).count() > 0)
    // travel back across the evolution boundary: the post-batch-1
    // snapshot under the CURRENT schema, w null everywhere (the
    // honest value for rows that predate the column)
    val back = Merge.readAsOf(spark, st, path, Seq("id"), s1)
      .select("id", "v", "w").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", None)))
    // the un-evolved replica replays the evolving batch and EVOLVES
    // with it — projecting onto the replica's old schema would have
    // silently dropped every w value
    val applied = Merge.replayChanges(st.read(replica, "delta"),
        feed.filter(col("batch") === s2), Seq("id"))
      .select("id", "v", "w").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    val source = st.read(path, "delta")
      .select("id", "v", "w").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(applied == source)
    assert(source == Seq((1L, "a", None), (2L, "B", Some(7L)),
      (3L, "c", None), (4L, "d", Some(9L))))
  }

  test("an orphan change batch (crashed capture, no commit marker) " +
      "is refused by travel and fenced+swept by vacuum") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("orphan_batch") + "/t"
    st.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, "delta", "overwrite")
    st.merge(Seq((3L, "c")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamps = Merge.changeFeed(spark, path)
      .select("batch").distinct().collect().map(_.getLong(0)).sorted
    assert(stamps.length == 1)
    // a completed capture carries its marker
    assert(Merge.isBatchCommitted(spark, path, stamps.head))
    // simulate the crash window: batch files landed (log-before-data),
    // data rewrite never happened, marker never written — the classic
    // orphan. Its delete row would DOUBLE-RESTORE id 1 if inverse
    // replay stepped across it blindly.
    val orphan = Merge.nextBatchStamp()
    Seq((1L, "a", "delete")).toDF("id", "v", "_change_type")
      .write.parquet(s"$path/${Merge.ChangesDirName}/batch=$orphan")
    assert(!Merge.isBatchCommitted(spark, path, orphan))
    // travel that must step across the orphan refuses loudly
    val e = intercept[IllegalStateException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamps.head).collect()
    }
    assert(e.getMessage.contains("no") &&
      e.getMessage.contains("commit marker"))
    // travel at/above the orphan never steps it — still served
    assert(Merge.readAsOf(spark, st, path, Seq("id"), orphan).count()
      == 3)
    // a DEFAULT vacuum leaves the fresh marker-less batch alone — it
    // is indistinguishable from a live in-flight capture (skip entry,
    // nothing touched)
    val guarded = Maintenance.vacuum(spark, path)
    assert(guarded.exists(a => a.kind == "skip" &&
      a.dest == orphan.toString), s"plan was $guarded")
    assert(!guarded.exists(_.kind == "delete"))
    assert(Fs.exists(spark,
      s"$path/${Merge.ChangesDirName}/batch=$orphan"))
    // past the age horizon (forced here with 0) vacuum fences travel
    // at the orphan's stamp, then removes it
    val plan = Maintenance.vacuum(spark, path, dryRun = true,
      orphanMinAgeMs = Some(0L))
    assert(plan.exists(a => a.kind == "fence" &&
      a.dest == orphan.toString))
    assert(plan.exists(a => a.kind == "delete" &&
      a.target.contains(s"batch=$orphan")))
    Maintenance.vacuum(spark, path, orphanMinAgeMs = Some(0L))
    assert(!Fs.exists(spark,
      s"$path/${Merge.ChangesDirName}/batch=$orphan"))
    // below the fence: loud horizon refusal (never a silent
    // reconstruction across the swept gap)
    val e2 = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), stamps.head).collect()
    }
    assert(e2.getMessage.contains("horizon"))
    // at the fence: the current state serves; the committed batch
    // keeps its marker and its feed rows
    assert(Merge.readAsOf(spark, st, path, Seq("id"), orphan).count()
      == 3)
    assert(Merge.isBatchCommitted(spark, path, stamps.head))
    assert(Merge.changeFeed(spark, path).select("batch").distinct()
      .count() == 1)
  }

  test("a crashed overwrite's stale horizon record does not refuse intact history") {
    import spark.implicits._
    val st = new BasicStorage(spark)
    val path = tempDir("over_crash") + "/t"
    st.write(Seq((1L, "a")).toDF("id", "v"), path, "delta", "overwrite")
    st.merge(Seq((2L, "b")).toDF("id", "v"), path,
      "full.id = incremental.id", captureChanges = true)
    val stamp = Merge.changeFeed(spark, path)
      .select("batch").distinct().head().getLong(0)
    // simulate overwriteSwap's crash window: the horizon record landed
    // in the op log, but the swap never happened — the table AND its
    // full feed are intact
    GraftLog.append(spark, path, "CHANGES_PRUNE", Nil,
      Some(Merge.ChangesOverwriteApp -> (stamp + 1)))
    // the surviving feed still holds stamps <= horizon ⇒ the record is
    // debris; travel the present batches can serve must succeed
    assert(Merge.readAsOf(spark, st, path, Seq("id"), Long.MinValue)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // a crashed PRUNE is the opposite contract: its record lands
    // BEFORE the deletes, and whether any batch is already gone is
    // unknowable — readAsOf must refuse CONSERVATIVELY even though
    // this feed happens to be intact
    GraftLog.append(spark, path, "CHANGES_PRUNE", Nil,
      Some(Merge.ChangesPruneApp -> stamp))
    val e = intercept[IllegalArgumentException] {
      Merge.readAsOf(spark, st, path, Seq("id"), Long.MinValue).collect()
    }
    assert(e.getMessage.contains("pruned change horizon"))
  }
}
