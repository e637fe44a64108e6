package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.QSketch.{sketchAgg, sketchMerge, sketchQuantiles}

/** The mergeable quantile sketch: exactness while uncompacted (n <= k),
  * layout-independence of the exact mode, bounded rank error on the
  * compacted path, the store → read-back → merge rollup pattern, and
  * null/empty handling. */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.1, 0.25, 0.5, 0.9, 0.99)

  /** Exact discrete quantile ground truth: ceil(p*n) rank, 1-based. */
  private def exactQ(sorted: Vector[Double], p: Double): Double =
    sorted(math.max(1, math.ceil(p * sorted.size).toInt) - 1)

  test("exact and layout-independent while n <= k") {
    val values = (0 until 400).map(i => ((i * 193) % 400).toDouble)
    val sorted = values.sorted.toVector
    for (parts <- Seq(1, 3, 8)) {
      val got = values.toDF("v").repartition(parts)
        .agg(sketchQuantiles(sketchAgg(col("v"), k = 512), Ps).as("q"))
        .collect()(0).getSeq[Double](0)
      assert(got == Ps.map(exactQ(sorted, _)), s"parts=$parts")
    }
  }

  test("rank error stays under 2% after heavy compaction (n = 100k, k = 512)") {
    // deterministic non-uniform stream: squared congruential values
    val n = 100000
    val values = (0 until n).map { i =>
      val x = ((i.toLong * 48271) % 100003).toDouble / 100003
      x * x * 1000.0
    }
    val sorted = values.sorted.toVector
    val got = values.toDF("v").repartition(16)
      .agg(sketchQuantiles(sketchAgg(col("v"), k = 512), Ps).as("q"))
      .collect()(0).getSeq[Double](0)
    Ps.zip(got).foreach { case (p, v) =>
      // measure error in RANK space: where the sketch's answer actually
      // sits in the sorted data vs where it should
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      val target = math.ceil(p * n)
      val rankErr = math.min(math.abs(lo + 1 - target), math.abs(hi - target)) / n.toDouble
      assert(rankErr <= 0.02, s"p=$p value=$v rankErr=$rankErr")
    }
  }

  test("sketch table rollup: store per-group sketches, merge equals one-shot") {
    val values = (0 until 3000).map(i => (i % 7, ((i * 7919) % 3000).toDouble))
    val df = values.toDF("g", "v").repartition(8)
    val dir = tempDir("qsketch")
    // build + persist the per-group sketch table (binary column)
    df.groupBy("g").agg(sketchAgg(col("v"), k = 512).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(sketchQuantiles(sketchMerge(col("sk"), k = 512), Ps).as("q"))
      .collect()(0).getSeq[Double](0)
    // n=3000 > k, so compaction ran; assert rank error <= 2% vs exact
    val sorted = values.map(_._2).sorted.toVector
    Ps.zip(merged).foreach { case (p, v) =>
      val lo = sorted.count(_ < v)
      val hi = sorted.count(_ <= v)
      val target = math.ceil(p * 3000)
      val rankErr = math.min(math.abs(lo + 1 - target), math.abs(hi - target)) / 3000.0
      assert(rankErr <= 0.02, s"p=$p value=$v rankErr=$rankErr")
    }
  }

  test("cross-snapshot refresh: two stored snapshots re-merge EQUAL to bulk (exact regime)") {
    // the persisted-sketch-table lifecycle over a REAL parquet round-trip
    // of the binary sketch column: day snapshots written separately,
    // read back, merged — in the exact regime (n <= k) the merged
    // quantiles are EQUAL to a one-shot bulk sketch and to ground truth,
    // not merely within the rank-error bound
    val day1 = (0 until 300).map(i => ((i * 193) % 700).toDouble)
    val day2 = (0 until 250).map(i => ((i * 389) % 900).toDouble + 0.5)
    val (d1, d2) = (tempDir("qs_snap1"), tempDir("qs_snap2"))
    day1.toDF("v").agg(sketchAgg(col("v"), k = 2048).as("sk"))
      .withColumn("day", lit("2024-01-01"))
      .write.mode("overwrite").parquet(d1)
    day2.toDF("v").agg(sketchAgg(col("v"), k = 2048).as("sk"))
      .withColumn("day", lit("2024-01-02"))
      .write.mode("overwrite").parquet(d2)
    val merged = spark.read.parquet(d1)
      .unionByName(spark.read.parquet(d2))
      .agg(sketchQuantiles(sketchMerge(col("sk"), k = 2048), Ps).as("q"))
      .collect()(0).getSeq[Double](0)
    val bulk = (day1 ++ day2).toDF("v")
      .agg(sketchQuantiles(sketchAgg(col("v"), k = 2048), Ps).as("q"))
      .collect()(0).getSeq[Double](0)
    assert(merged == bulk, "snapshot-merge drifted from the bulk sketch")
    val sorted = (day1 ++ day2).sorted.toVector
    Ps.zip(merged).foreach { case (p, v) =>
      assert(v == exactQ(sorted, p), s"p=$p: merged=$v truth=${exactQ(sorted, p)}")
    }
  }

  test("nulls are skipped; all-null group yields null quantiles") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(sketchQuantiles(sketchAgg(col("v")), Seq(0.5)).as("q"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").map(_.asInstanceOf[scala.collection.Seq[Double]].toList)
      == Some(List(1.0)))
    assert(got("b").isEmpty)
  }

  test("non-binary merge input is rejected at analysis") {
    val df = Seq(("x", "not a number")).toDF("g", "s")
    val e1 = intercept[Exception] {
      df.groupBy("g").agg(QSketch.sketchMerge(col("s"))).collect()
    }
    assert(e1.getMessage.contains("binary"), e1.getMessage)
  }

  test("serialize/deserialize round-trips a compacted sketch") {
    val s = new QSketch(64)
    (0 until 5000).foreach(i => s.update(((i * 31) % 5000).toDouble))
    val back = QSketch.deserialize(s.serialize)
    assert(back.quantiles(Array(0.1, 0.5, 0.9)).toSeq ==
      s.quantiles(Array(0.1, 0.5, 0.9)).toSeq)
    assert(back.count == s.count)
  }
}
