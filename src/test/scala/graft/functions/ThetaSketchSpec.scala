package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ThetaSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import ThetaSketch._

  test("exact below nominal entries: estimates equal true counts") {
    // A = 0..999, B = 500..1499 → |A|=1000 |B|=1000 |A∩B|=500 |A\B|=500
    val df = ((0L until 1000L).map(("a", _)) ++
      (500L until 1500L).map(("b", _))).toDF("g", "k")
      .repartition(7, col("k"))
    val sk = df.groupBy("g").agg(thetaAgg(col("k")).as("s"))
    val a = sk.filter(col("g") === "a").select(col("s").as("sa"))
    val b = sk.filter(col("g") === "b").select(col("s").as("sb"))
    val r = a.crossJoin(b).select(
      thetaEstimate(col("sa")).as("na"),
      thetaEstimate(col("sb")).as("nb"),
      thetaEstimate(thetaIntersect(col("sa"), col("sb"))).as("nboth"),
      thetaEstimate(thetaDiff(col("sa"), col("sb"))).as("nonly"))
      .head()
    assert(r.getDouble(0) == 1000.0 && r.getDouble(1) == 1000.0)
    assert(r.getDouble(2) == 500.0 && r.getDouble(3) == 500.0)
  }

  test("approximate beyond nominal entries: within 5%, layout-independent") {
    val n = 50000L
    def est(parts: Int): Double =
      (0L until n).toDF("k").repartition(parts, col("k"))
        .agg(thetaEstimate(thetaAgg(col("k"))).as("e"))
        .head().getDouble(0)
    val e = est(13)
    assert(math.abs(e - n) / n < 0.05, s"estimate $e vs $n")
    // same input, different partitioning → union is order-insensitive
    // only statistically; theta retains the k smallest hashes, which
    // is a pure function of the VALUE SET — so estimates are identical
    assert(est(3) == e)
  }

  test("set algebra over independently built sketches composes") {
    val x = (0L until 6000L).toDF("k")
      .agg(thetaAgg(col("k")).as("s")).head().getAs[Array[Byte]](0)
    val y = (3000L until 9000L).toDF("k")
      .agg(thetaAgg(col("k")).as("s")).head().getAs[Array[Byte]](0)
    val inter = ThetaSketch.estimate(ThetaSketch.setOp(x, y, intersect = true))
    val diff = ThetaSketch.estimate(ThetaSketch.setOp(x, y, intersect = false))
    assert(math.abs(inter - 3000.0) / 3000.0 < 0.1, s"inter $inter")
    assert(math.abs(diff - 3000.0) / 3000.0 < 0.1, s"diff $diff")
    // union of the sketches ≈ |X ∪ Y| = 9000
    val u = ThetaSketch.unionOf(Seq(x, y)).getResult.getEstimate
    assert(math.abs(u - 9000.0) / 9000.0 < 0.1, s"union $u")
  }
}
