package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OptimizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def storage = new BasicStorage(spark)

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory && !f.getName.startsWith("_")) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  test("compaction merges many small files into few; rows unchanged") {
    val dir = tempDir("opt1")
    Fs.delete(spark, dir)
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "value")
    storage.write(df.repartition(24), dir, "delta", "overwrite")
    assert(dataFiles(dir).size > 8)
    val n = Optimize.run(spark, storage, dir)
    assert(n <= 2 && dataFiles(dir).size.toLong == n)
    assertDfEqual(storage.read(dir, "delta"), df)
    val ops = GraftLog.history(spark, dir).select("operation")
      .as[String].collect().toSeq
    assert(ops.head == "OPTIMIZE")
  }

  test("clusterBy makes data-skipping prune hard; stats are refreshed") {
    val dir = tempDir("opt2")
    Fs.delete(spark, dir)
    // scattered layout: every file spans the whole key range
    val df = (1L to 4000L).map(i => (i, i % 7)).toDF("id", "junk")
    storage.write(df.repartition(8), dir, "delta", "overwrite")
    DataSkipping.collectStats(spark, dir, Seq("id"))
    val before = DataSkipping.pruneFiles(spark, dir, "id", Some(1L), Some(100L))
    assert(before.size == 8) // no pruning possible on a scattered layout
    Optimize.run(spark, storage, dir, clusterBy = Seq("id"),
      targetFileBytes = 8L * 1024)
    val total = dataFiles(dir).size
    assert(total > 1)
    val after = DataSkipping.pruneFiles(spark, dir, "id", Some(1L), Some(100L))
    assert(after.size < total, s"clustered pruning kept $after of $total")
    val got = DataSkipping.prunedRead(spark, dir, "id", Some(1L), Some(100L))
      .filter(col("id").between(1L, 100L))
    assert(got.count() == 100L)
  }

  test("zOrder prunes on BOTH columns; plain clustering only the first") {
    // two independent uniform keys: after lexicographic clustering on
    // (a, b), file stats are tight on a but span everything on b; after
    // z-order both predicates prune
    val rng = new scala.util.Random(42)
    val df = (1L to 8000L).map(i =>
      (i, rng.nextInt(8000).toLong, rng.nextInt(8000).toLong))
      .toDF("id", "a", "b")

    def prunedCount(dir: String, colName: String): Int =
      DataSkipping.pruneFiles(spark, dir, colName, Some(1L), Some(400L)).size

    val lex = tempDir("opt_lex"); Fs.delete(spark, lex)
    storage.write(df.repartition(8), lex, "delta", "overwrite")
    DataSkipping.collectStats(spark, lex, Seq("a", "b"))
    Optimize.run(spark, storage, lex, clusterBy = Seq("a", "b"),
      targetFileBytes = 12L * 1024)
    val lexTotal = dataFiles(lex).size
    assert(lexTotal >= 6, s"want many files, got $lexTotal")
    assert(prunedCount(lex, "a") < lexTotal) // leading column prunes
    assert(prunedCount(lex, "b") == lexTotal,
      "lexicographic clustering should NOT prune the trailing column")

    val zed = tempDir("opt_z"); Fs.delete(spark, zed)
    storage.write(df.repartition(8), zed, "delta", "overwrite")
    DataSkipping.collectStats(spark, zed, Seq("a", "b"))
    Optimize.run(spark, storage, zed, clusterBy = Seq("a", "b"),
      targetFileBytes = 12L * 1024, zOrder = true)
    val zTotal = dataFiles(zed).size
    assert(zTotal >= 6, s"want many files, got $zTotal")
    assert(prunedCount(zed, "a") < zTotal, "z-order must prune on a")
    assert(prunedCount(zed, "b") < zTotal, "z-order must prune on b")

    // layout change is result-invisible
    assertDfEqual(storage.read(zed, "delta"), df)
    // pruned read + row filter returns exactly the matching rows
    val got = DataSkipping.prunedRead(spark, zed, "b", Some(1L), Some(400L))
      .filter(col("b").between(1L, 400L))
    assert(got.count() == df.filter(col("b").between(1L, 400L)).count())
  }

  test("zOrder balances file sizes on heavy-tailed columns (equi-depth buckets)") {
    // 99% of the mass sits in [0, 1000] while the range extends to 1e12:
    // fixed-width buckets would map ~all rows to bucket 0, the Z-values
    // would tie, and the range partitioner (which cannot split equal
    // keys) would emit one giant file. Equi-depth buckets spread the
    // mass, so files stay balanced AND the dense region stays prunable.
    val rng = new scala.util.Random(7)
    def skewed(): Long =
      if (rng.nextInt(100) == 0) (rng.nextDouble() * 1e12).toLong
      else rng.nextInt(1000).toLong
    val df = (1L to 8000L).map(i => (i, skewed(), skewed()))
      .toDF("id", "a", "b")

    val dir = tempDir("opt_zskew"); Fs.delete(spark, dir)
    storage.write(df.repartition(8), dir, "delta", "overwrite")
    DataSkipping.collectStats(spark, dir, Seq("a", "b"))
    Optimize.run(spark, storage, dir, clusterBy = Seq("a", "b"),
      targetFileBytes = 16L * 1024, zOrder = true)

    val sizes = dataFiles(dir).map(_.length()).sorted
    assert(sizes.size >= 4, s"want several files, got ${sizes.size}")
    assert(sizes.last < 4 * sizes.head,
      s"skewed z-order produced unbalanced files: $sizes")

    // the dense region still prunes: a predicate inside [0, 1000]
    // must skip files despite the 1e12 outlier range
    val total = dataFiles(dir).size
    val pruned = DataSkipping.pruneFiles(spark, dir, "a",
      Some(0L), Some(100L)).size
    assert(pruned < total, s"dense-region predicate kept $pruned of $total")
    assertDfEqual(storage.read(dir, "delta"), df)
  }

  test("CdfBucketExpr kernel: monotone, clamped at both ends, tie/NaN-safe") {
    import graft.functions.CdfBucketExpr.bucket
    val vals = Array(0.0, 10.0, 50.0, 100.0)
    val cdfs = Array(0.0, 0.25, 0.75, 1.0)
    assert(bucket(-5.0, vals, cdfs, 15) == 0L)   // below range clamps
    assert(bucket(200.0, vals, cdfs, 15) == 15L) // above range clamps
    val sweep = (-10 to 110).map(v => bucket(v.toDouble, vals, cdfs, 15))
    assert(sweep == sweep.sorted, "bucket must be monotone in the value")
    assert(bucket(10.0, vals, cdfs, 15) == Math.floor(0.25 * 15).toLong)
    // equal adjacent knots (possible after clamping p at the array
    // edge) must take the right knot's cdf, not divide by zero
    assert(bucket(99.0, Array(0.0, 10.0, 10.0), Array(0.0, 0.5, 1.0), 15) == 15L)
    assert(bucket(Double.NaN, vals, cdfs, 15) == 0L)
  }

  test("zOrder rejects non-numeric clustering columns") {
    val dir = tempDir("opt_znn")
    Fs.delete(spark, dir)
    storage.write((1L to 50L).map(i => (i, s"s$i")).toDF("id", "s"),
      dir, "delta", "overwrite")
    val e = intercept[IllegalArgumentException] {
      Optimize.run(spark, storage, dir, clusterBy = Seq("id", "s"),
        zOrder = true)
    }
    assert(e.getMessage.contains("s"))
  }

  test("partitioned table keeps its layout through optimize") {
    val dir = tempDir("opt3")
    Fs.delete(spark, dir)
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) "A" else "B"))
      .toDF("id", "part")
    storage.write(df.repartition(6), dir, "delta", "overwrite",
      partitionFields = Seq("part"))
    Optimize.run(spark, storage, dir)
    assert(new java.io.File(s"$dir/part=A").isDirectory)
    assert(new java.io.File(s"$dir/part=B").isDirectory)
    assertDfEqual(storage.read(dir, "delta").select("id", "part"), df)
  }

  test("OPTIMIZE WHERE compacts only the matching partitions; every " +
      "other partition's files stay byte-identical") {
    val dir = tempDir("opt_where") + "/t"
    val df = (1L to 600L).map(i => (i, s"P${i % 3}", i * 1.5))
      .toDF("id", "part", "v")
    storage.write(df.repartition(8), dir, "delta", "overwrite",
      partitionFields = Seq("part"))
    def files(sub: String) = Fs.dataFiles(spark, dir)
      .filter(_._1.contains(s"part=$sub")).sortBy(_._1)
    val beforeP1 = files("P1")
    val beforeP2 = files("P2")
    assert(files("P0").size > 1, "the fixture must start fragmented")
    Optimize.run(spark, storage, dir, where = Some("part = 'P0'"))
    assert(files("P0").size < 8, "the matched partition must compact")
    assert(files("P1") == beforeP1 && files("P2") == beforeP2,
      "unmatched partitions' files must stay byte-identical")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "v"), df)
    // scoped clusterBy: still content-invisible, still scoped
    Optimize.run(spark, storage, dir, clusterBy = Seq("id"),
      where = Some("part = 'P1'"))
    assert(files("P2") == beforeP2,
      "a scoped clustered rewrite must not touch unmatched partitions")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "v"), df)
  }

  test("OPTIMIZE WHERE refuses data-column predicates and " +
      "unpartitioned tables; an unmatched predicate is a no-op") {
    val dir = tempDir("opt_where_ref") + "/t"
    val df = (1L to 100L).map(i => (i, s"P${i % 2}", i * 1.0))
      .toDF("id", "part", "v")
    storage.write(df, dir, "delta", "overwrite",
      partitionFields = Seq("part"))
    val e = intercept[IllegalArgumentException] {
      Optimize.run(spark, storage, dir, where = Some("id > 5"))
    }
    assert(e.getMessage.contains("partition columns"),
      s"the refusal must say WHY: ${e.getMessage}")
    val flat = tempDir("opt_where_flat") + "/t"
    storage.write(df, flat, "delta", "overwrite")
    intercept[IllegalArgumentException] {
      Optimize.run(spark, storage, flat, where = Some("part = 'P0'"))
    }
    // unmatched predicate: nothing rewritten, no OPTIMIZE op recorded
    val opsBefore = GraftLog.history(spark, dir).count()
    val beforeFiles = Fs.dataFiles(spark, dir).sortBy(_._1)
    Optimize.run(spark, storage, dir, where = Some("part = 'NOPE'"))
    assert(Fs.dataFiles(spark, dir).sortBy(_._1) == beforeFiles)
    assert(GraftLog.history(spark, dir).count() == opsBefore,
      "a no-op scoped optimize must not record an OPTIMIZE entry")
  }

  test("a crashed scoped optimize is healed — by vacuum, and by the " +
      "next optimize at entry — with zero data loss") {
    val dir = tempDir("opt_where_crash") + "/t"
    val df = (1L to 300L).map(i => (i, s"P${i % 3}", i * 1.5))
      .toDF("id", "part", "v")
    storage.write(df.repartition(4), dir, "delta", "overwrite",
      partitionFields = Seq("part"))
    val aside = PartitionSwap.asidePath(dir)
    // crash state 1: P0's swap died between its two renames — the
    // live dir is MISSING, the aside holds the only complete copy
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(aside))
    Fs.renameChecked(spark, s"$dir/part=P0", s"$aside/part=P0")
    // crash state 2: P1's swap COMPLETED before the crash — live dir
    // present, its aside is a stale pre-swap copy
    Fs.copyDirChecked(spark, s"$dir/part=P1", s"$aside/part=P1")
    assert(storage.read(dir, "delta").count() == 200L,
      "the planted crash hides P0 (the window under repair)")
    val actions = Maintenance.vacuum(spark, dir)
    assert(actions.exists(a => a.kind == "heal" &&
        a.target.endsWith("part=P0")),
      s"the missing partition must heal from its aside: $actions")
    assert(actions.exists(a => a.kind == "delete" &&
        a.target.endsWith("__graft_partaside/part=P1")),
      s"the completed swap's aside must drop: $actions")
    assert(!Fs.exists(spark, aside), "the aside root must be gone")
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "v"), df)
    // same crash again, healed by the NEXT optimize at entry (it must
    // restore P0 before reading, or the rewrite would drop its rows)
    Fs.renameChecked(spark, s"$dir/part=P0", s"$aside/part=P0")
    Optimize.run(spark, storage, dir, where = Some("part = 'P2'"))
    assert(!Fs.exists(spark, aside))
    assertDfEqual(storage.read(dir, "delta").select("id", "part", "v"), df)
  }

  test("vacuum: drops stale tmp/old dirs; completes or restores a crashed swap") {
    val dir = tempDir("opt_vac") + "/t"
    Fs.delete(spark, dir)
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "value")
    storage.write(df, dir, "delta", "overwrite")

    // healthy table + leftovers from a crash-before-swap
    storage.read(dir, "delta").write.parquet(dir + "__graft_tmp")
    storage.read(dir, "delta").write.parquet(dir + "__graft_old")
    val acts1 = Optimize.vacuum(spark, dir)
    assert(acts1.size == 2)
    assert(!Fs.exists(spark, dir + "__graft_tmp"))
    assert(!Fs.exists(spark, dir + "__graft_old"))
    assertDfEqual(storage.read(dir, "delta"), df)

    // crash mid-swap: base renamed away, new data sits in tmp
    Fs.renameChecked(spark, dir, dir + "__graft_old")
    df.limit(50).write.parquet(dir + "__graft_tmp")
    val acts2 = Optimize.vacuum(spark, dir)
    assert(acts2.exists(_.contains("completed interrupted swap")), acts2)
    assert(spark.read.parquet(dir).count() == 50)
    assert(!Fs.exists(spark, dir + "__graft_old"))

    // crash right after base rename, no tmp: restore the old copy
    Fs.renameChecked(spark, dir, dir + "__graft_old")
    val acts3 = Optimize.vacuum(spark, dir)
    assert(acts3.exists(_.contains("restored table")), acts3)
    assert(spark.read.parquet(dir).count() == 50)

    assert(Optimize.vacuum(spark, dir).isEmpty) // idempotent
  }

  test("non-managed path is rejected") {
    val dir = tempDir("opt4")
    Fs.delete(spark, dir)
    (1L to 10L).toDF("id").write.parquet(dir)
    intercept[IllegalArgumentException] {
      Optimize.run(spark, storage, dir)
    }
  }
}
