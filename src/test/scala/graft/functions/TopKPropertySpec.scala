package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.BoundedTopKAgg.{maxK, minK}

/** Model-based property tests: on random multisets (with planted
  * duplicates and nulls, shuffled across partitions) the bounded
  * aggregate must equal the plain-Scala sort model for every group,
  * both directions, at several k. */
class TopKPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("property: minK/maxK equal the sorted-take model on random data") {
    for (seed <- 0 until 8) {
      val rng = new scala.util.Random(seed)
      val k = rng.nextInt(6) + 1
      val nParts = rng.nextInt(7) + 2
      val rows = (0 until 300).map { _ =>
        val g = s"g${rng.nextInt(5)}"
        // duplicates likely (small value domain); ~8% nulls
        val v: java.lang.Integer =
          if (rng.nextInt(12) == 0) null else Int.box(rng.nextInt(40) - 20)
        (g, v)
      }
      val df = rows.toDF("g", "v").repartition(nParts)
      val got = df.groupBy("g")
        .agg(minK(col("v"), k).as("lo"), maxK(col("v"), k).as("hi"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getSeq[Int](1).toList, r.getSeq[Int](2).toList)).toMap
      val model = rows.groupBy(_._1).map { case (g, rs) =>
        val vs = rs.flatMap(r => Option(r._2).map(_.intValue)).sorted
        g -> (vs.take(k).toList, vs.reverse.take(k).toList)
      }
      model.foreach { case (g, (lo, hi)) =>
        assert(got(g)._1 == lo, s"seed=$seed k=$k minK($g)")
        assert(got(g)._2 == hi, s"seed=$seed k=$k maxK($g)")
      }
    }
  }

  test("property: result is layout-independent (same heap after any repartition)") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 500).map(i => (s"g${i % 3}", rng.nextInt(1000)))
    val base = rows.toDF("g", "v")
    val a = base.repartition(2).groupBy("g").agg(minK(col("v"), 4).as("lo"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    val b = base.repartition(17, col("v")).groupBy("g")
      .agg(minK(col("v"), 4).as("lo"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(a == b)
  }
}
