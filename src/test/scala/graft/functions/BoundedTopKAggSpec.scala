package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.BoundedTopKAgg.{maxK, minK}

/** The bounded top-k custom aggregate: correctness vs sort-based ground
  * truth across shuffled multi-partition input (which exercises the
  * partial-aggregate serialize/merge path), null handling, short
  * groups, and struct ordering. */
class BoundedTopKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val rows = {
    // 3 groups × 100 values, deliberately unsorted, over 8 partitions
    val data = for (g <- Seq("a", "b", "c"); i <- 0 until 100)
      yield (g, (i * 37) % 100)
    data.toDF("g", "v").repartition(8)
  }

  test("minK/maxK equal the sorted ground truth across a shuffle") {
    val got = rows.groupBy("g")
      .agg(minK(col("v"), 5).as("lo"), maxK(col("v"), 5).as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Int](1).toList, r.getSeq[Int](2).toList)).toMap
    for (g <- Seq("a", "b", "c")) {
      assert(got(g)._1 == List(0, 1, 2, 3, 4), s"minK($g)")
      assert(got(g)._2 == List(99, 98, 97, 96, 95), s"maxK($g)")
    }
  }

  test("groups shorter than k return all values; nulls are skipped") {
    val df = Seq(("a", Some(3)), ("a", None), ("a", Some(1)),
      ("b", None)).toDF("g", "v").repartition(4)
    val got = df.groupBy("g").agg(minK(col("v"), 5).as("lo"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(got == Map("a" -> List(1, 3), "b" -> Nil))
  }

  test("struct ordering keys: (value, tiebreak) lexicographic") {
    val df = Seq(("g", 2, "x"), ("g", 1, "z"), ("g", 1, "y"))
      .toDF("g", "v", "id").repartition(3)
    val got = df.groupBy("g")
      .agg(minK(struct(col("v"), col("id")), 2).as("lo"))
      .select(explode(col("lo")).as("s")).select("s.*")
      .collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(got == List((1, "y"), (1, "z")))
  }

  test("global (no groupBy) aggregation works") {
    val got = rows.agg(maxK(col("v"), 3).as("hi"))
      .head().getSeq[Int](0).toList
    assert(got == List(99, 99, 99)) // three groups each hold a 99
  }

  test("non-orderable input is rejected at analysis") {
    val df = Seq(("a", Map(1 -> 2))).toDF("g", "m")
    val e = intercept[Exception] {
      df.groupBy("g").agg(minK(col("m"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("orderable"))
  }
}
