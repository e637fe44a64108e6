package graft.storage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DataSkippingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("stats record per-file min/max; pruning reads only intersecting files") {
    val dir = tempDir("skip1")
    Fs.delete(spark, dir)
    // range-clustered layout -> tight per-file key ranges
    (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "value")
      .repartitionByRange(4, col("id")).write.parquet(dir)
    val stats = DataSkipping.collectStats(spark, dir, Seq("id"))
    assert(stats.select("file").distinct().count() == 4)
    assert(stats.agg(sum("num_rows")).head().getLong(0) == 1000L)

    val all = DataSkipping.pruneFiles(spark, dir, "id", None, None)
    assert(all.size == 4)
    val some = DataSkipping.pruneFiles(spark, dir, "id", Some(100L), Some(120L))
    assert(some.size < 4 && some.nonEmpty)

    val got = DataSkipping.prunedRead(spark, dir, "id", Some(100L), Some(120L))
      .filter(col("id").between(100L, 120L))
    assert(got.count() == 21)
  }

  test("pruned read is a superset; files without stats are kept") {
    val dir = tempDir("skip2")
    Fs.delete(spark, dir)
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id"))
    // a later write the stats don't know about
    Seq((1000L, 1L)).toDF("id", "v").write.mode("append").parquet(dir)
    val files = DataSkipping.pruneFiles(spark, dir, "id", Some(999L), Some(2000L))
    // the stats-less new file must survive pruning
    val rows = DataSkipping.prunedRead(spark, dir, "id", Some(999L), Some(2000L))
      .filter(col("id") >= 999L).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1000L))
    assert(files.nonEmpty)
  }

  test("string column stats prune lexicographically") {
    val dir = tempDir("skip3")
    Fs.delete(spark, dir)
    Seq("apple", "banana", "cherry").toDF("s").coalesce(1).write.parquet(dir)
    Seq("xray", "yak", "zebra").toDF("s").coalesce(1)
      .write.mode("append").parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("s"))
    val hit = DataSkipping.pruneFiles(spark, dir, "s", Some("x"), Some("z"))
    assert(hit.size == 1)
    val out = DataSkipping.prunedRead(spark, dir, "s", Some("x"), Some("z"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("xray", "yak", "zebra"))
  }

  test("configured observer refreshes stats on every write and merge") {
    val dir = tempDir("skip_obs")
    Fs.delete(spark, dir)
    spark.conf.set("io.graft.storage.skipping_columns", "id, other_col")
    try {
      val st = GraftStorage.configure(spark,
        isolationProvider = Some(() => ""), trackLineage = false)
      st.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "value"),
        dir, "delta", "overwrite")
      val stats1 = spark.read.parquet(DataSkipping.statsPath(dir))
      assert(stats1.select("column").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("id"))
      assert(stats1.agg(max("max")).head().getString(0).toLong == 50L)
      st.merge(Seq((60L, "new")).toDF("id", "value"), dir,
        "full.id = incremental.id")
      val stats2 = spark.read.parquet(DataSkipping.statsPath(dir))
      assert(stats2.agg(max(col("max").cast("long"))).head().getLong(0) == 60L)
    } finally spark.conf.unset("io.graft.storage.skipping_columns")
  }

  test("empty intersection yields an empty (but valid-schema) frame") {
    val dir = tempDir("skip4")
    Fs.delete(spark, dir)
    (1L to 10L).toDF("id").coalesce(1).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id"))
    val got = DataSkipping.prunedRead(spark, dir, "id", Some(500L), Some(600L))
    assert(got.columns.toSeq == Seq("id"))
    assert(got.count() == 0)
  }

  test("multi-column pruning intersects the per-column survivor sets") {
    val dir = tempDir("skip_multi")
    Fs.delete(spark, dir)
    // two clustered dimensions: id ranges AND v ranges both tight
    Seq((1L, 100L), (2L, 110L)).toDF("id", "v").coalesce(1).write.parquet(dir)
    Seq((50L, 100L), (51L, 120L)).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq((90L, 500L), (91L, 510L)).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id", "v"))
    // id <= 60 keeps files 1+2; v >= 115 keeps files 2+3; AND keeps 2
    val got = DataSkipping.prunedReadMulti(spark, dir, Seq(
      ("id", None, Some(60L)), ("v", Some(115L), None)))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(50L, 51L)) // exactly one file's rows
  }

  test("a narrower collect does not wipe other columns' stats") {
    val dir = tempDir("skip_narrow")
    Fs.delete(spark, dir)
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id", "v"))
    // an observer firing with a frame that only has "id" (schema-
    // evolving merge) must leave the "v" stats for unchanged files
    DataSkipping.collectStats(spark, dir, Seq("id"))
    val cols = spark.read.parquet(DataSkipping.statsPath(dir))
      .select("column").distinct().collect().map(_.getString(0)).toSet
    assert(cols == Set("id", "v"))
    assert(DataSkipping.pruneFiles(spark, dir, "v", Some(5000L), None).isEmpty)
  }

  test("missing dir and unparseable bounds degrade conservatively") {
    val dir = tempDir("skip_edge")
    Fs.delete(spark, dir)
    // collectStats on a path with no files: no crash, no dir created
    val empty = DataSkipping.collectStats(spark, dir, Seq("id"))
    assert(empty.count() == 0)
    assert(!Fs.exists(spark, dir))
    // bounds that don't parse in the stat domain keep every file
    (1L to 10L).toDF("id").coalesce(1).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id"))
    val kept = DataSkipping.pruneFiles(spark, dir, "id",
      Some(java.sql.Date.valueOf("2024-01-01")), None)
    assert(kept.size == 1)
  }

  test("property: pruned read + row filter equals full filter") {
    for (seed <- 0 until 8) {
      val rng = new scala.util.Random(seed)
      val dir = tempDir(s"skip_prop$seed")
      Fs.delete(spark, dir)
      val n = rng.nextInt(400) + 100
      val data = (0 until n).map(_ => rng.nextLong() % 1000L)
      val layout = rng.nextInt(5) + 1
      val df = data.toDF("id")
      (if (rng.nextBoolean()) df.repartitionByRange(layout, col("id"))
       else df.repartition(layout)).write.parquet(dir)
      DataSkipping.collectStats(spark, dir, Seq("id"))
      val lo = rng.nextLong() % 800L
      val hi = lo + rng.nextInt(400)
      val pruned = DataSkipping.prunedRead(spark, dir, "id", Some(lo), Some(hi))
        .filter(col("id").between(lo, hi))
        .collect().map(_.getLong(0)).sorted.toSeq
      val expected = data.filter(v => v >= lo && v <= hi).sorted
      assert(pruned == expected, s"seed=$seed lo=$lo hi=$hi layout=$layout")
    }
  }

  test("bloom skipping: point lookup prunes scattered files; superset holds") {
    val dir = tempDir("bloomskip")
    Fs.delete(spark, dir)
    // hash-scattered layout: every file spans the id range, so min/max
    // stats CANNOT prune — the bloom layer is what drops files here
    (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "value")
      .repartition(8, col("id")).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id"))
    assert(DataSkipping.pruneFiles(spark, dir, "id",
      Some(42L), Some(42L)).size == 8, "min/max must be useless here")
    DataSkipping.collectBloom(spark, dir, "id",
      expectedItemsPerFile = 10000L)
    // a single needle lands in 1 file (+ rare FP files)
    val one = DataSkipping.pruneFilesBloom(spark, dir, "id", Seq(42L))
    assert(one.nonEmpty && one.size <= 3,
      s"expected ~1 surviving file, got ${one.size}")
    // an absent needle may prune everything; never returns wrong rows
    val absent = DataSkipping
      .prunedReadBloom(spark, dir, "id", Seq(99999999L))
      .filter(col("id") === 99999999L)
    assert(absent.count() == 0)
    // result identical to the full read for a mixed present/absent set
    val wanted = Seq(42L, 7L, 3999L, 99999999L)
    val got = DataSkipping.prunedReadBloom(spark, dir, "id", wanted)
      .filter(col("id").isin(wanted: _*))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(7L, 42L, 3999L))
    // files without a bloom row are kept conservatively: a later
    // append is unindexed until the next collectBloom
    Seq((9000001L, "x")).toDF("id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    val afterAppend = DataSkipping
      .prunedReadBloom(spark, dir, "id", Seq(9000001L))
      .filter(col("id") === 9000001L)
    assert(afterAppend.count() == 1,
      "unindexed new file must survive pruning")
    // probe literals are cast to the COLUMN's type before hashing:
    // xxhash64(int 42) != xxhash64(long 42L), so an Int probe against
    // this bigint column would otherwise hash-miss and prune the file
    // that DOES hold the value — wrong rows, not just a missed prune
    val intProbe = DataSkipping
      .prunedReadBloom(spark, dir, "id", Seq(42))
      .filter(col("id") === 42L)
    assert(intProbe.count() == 1,
      "Int probe of a bigint column pruned the true file")
    val strProbe = DataSkipping
      .prunedReadBloom(spark, dir, "id", Seq("3999"))
      .filter(col("id") === 3999L)
    assert(strProbe.count() == 1,
      "castable string probe pruned the true file")
    intercept[IllegalArgumentException] {
      DataSkipping.pruneFilesBloom(spark, dir, "nope", Seq(1L))
    }
  }

  test("metadataProfile: exact sidecar answers; partial coverage throws") {
    val dir = tempDir("metaprof")
    Fs.delete(spark, dir)
    val rows = (1L to 500L).map(i =>
      (i, if (i % 5 == 0) null else s"s${1000 - i}"))
    rows.toDF("id", "s").repartition(4).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id", "s"))
    val idp = DataSkipping.metadataProfile(spark, dir, "id").head()
    assert(idp.getString(1) == "long")
    assert(idp.getLong(2) == 500L && idp.getLong(3) == 0L)
    assert(idp.getString(4) == "1" && idp.getString(5) == "500")
    val sp = DataSkipping.metadataProfile(spark, dir, "s").head()
    assert(sp.getString(1) == "string")
    assert(sp.getLong(2) == 500L && sp.getLong(3) == 100L)
    // lexical extremes over the non-null strings, across 4 files
    // (i=500 is a null — the smallest surviving value is s501)
    assert(sp.getString(4) == "s501" && sp.getString(5) == "s999")
    // a new un-statted file makes the metadata answer unsound — throw,
    // never a plausible wrong number
    Seq((9999L, "zzz")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      DataSkipping.metadataProfile(spark, dir, "id")
    }
    assert(e.getMessage.contains("no stats row"))
  }

  test("AutoCompactObserver compacts past the threshold, result-invisible") {
    val st = new BasicStorage(spark)
    st.registerOutputObserver(new AutoCompactObserver(maxFiles = 6))
    val path = tempDir("autocompact") + "/t"
    // base write under threshold: no compaction
    st.write((1L to 100L).toDF("id").repartition(4), path, "delta",
      "overwrite")
    assert(Fs.dataFiles(spark, path).size == 4)
    // appends push past the threshold → the NEXT observed write compacts
    st.write((101L to 200L).toDF("id").repartition(4), path, "delta",
      "append")
    val after = Fs.dataFiles(spark, path).size
    assert(after < 8, s"expected compaction under 8 files, got $after")
    // rows byte-identical through the compaction
    assert(spark.read.parquet(path).as[Long].collect().sorted.toSeq ==
      (1L to 200L))
    val ops = GraftLog.history(spark, path).collect().map(_.getString(0))
    assert(ops.contains("OPTIMIZE"))
  }

  test("metadataProfile opens ZERO data files — proof by corrupting them") {
    val dir = tempDir("metazero")
    Fs.delete(spark, dir)
    (1L to 300L).toDF("id").repartition(3).write.parquet(dir)
    DataSkipping.collectStats(spark, dir, Seq("id"))
    // overwrite every data file with garbage bytes IN PLACE (same
    // names — the coverage check still matches): any attempt to read
    // data would now throw, so a correct answer proves sidecar-only
    val conf = spark.sessionState.newHadoopConf()
    Fs.dataFiles(spark, dir).foreach { case (f, _) =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      out.write("not parquet".getBytes); out.close()
    }
    val row = DataSkipping.metadataProfile(spark, dir, "id").head()
    assert(row.getLong(2) == 300L && row.getString(4) == "1" &&
      row.getString(5) == "300")
  }
}
