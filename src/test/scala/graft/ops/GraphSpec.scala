package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Transition counts and the exact-integer PageRank: hand-computed
  * fixtures (the scaled-integer arithmetic is specified to the bit, so
  * expected values are literals, not tolerances). */
class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("transitionCounts: per-key consecutive pairs, tie on id") {
    // user 1: a -> b -> a ; user 2: b -> b. Equal timestamps for user 2
    // resolve on event_id.
    val ev = Seq(
      (1L, ts(10), 100L, "a"), (1L, ts(20), 101L, "b"), (1L, ts(30), 102L, "a"),
      (2L, ts(10), 200L, "b"), (2L, ts(10), 201L, "b"))
      .toDF("user_id", "t", "event_id", "state")
    val got = Graph.transitionCounts(ev, "user_id", "t", "event_id", "state")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L)))
  }

  test("pageRank: hand-computed sink-leak fixture, exact") {
    // single edge a -> b: b is a sink; after the first round a holds
    // only its base share and b inherits a's damped mass.
    val edges = Seq(("a", "b", 5L)).toDF("src", "dst", "w")
    val got = Graph.pageRankScaled(edges, "src", "dst", "w", iterations = 2)
      .select("node", "rank_scaled").as[(String, Long)].collect().toMap
    // base = 1e9/2 = 500000000; p(a->b) = 1e6
    // r1: a = floor(5e8*15/100) = 75000000
    //     b = 75000000 + floor(85*5e8/100) = 500000000
    // r2: a = 75000000
    //     b = 75000000 + floor(85*75000000/100) = 138750000
    assert(got == Map("a" -> 75000000L, "b" -> 138750000L))
  }

  test("pageRank: symmetric 2-cycle is the stationary uniform point") {
    val edges = Seq(("a", "b", 3L), ("b", "a", 7L)).toDF("src", "dst", "w")
    val got = Graph.pageRankScaled(edges, "src", "dst", "w", iterations = 5)
      .select("node", "rank_scaled").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("pageRank: deterministic across reruns and partitionings") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L),
      ("a", "c", 1L), ("c", "b", 4L)).toDF("src", "dst", "w")
    val r1 = Graph.pageRankScaled(edges, "src", "dst", "w", 4)
      .select("node", "rank_scaled").as[(String, Long)].collect().toMap
    val r2 = Graph.pageRankScaled(edges.repartition(5), "src", "dst", "w", 4)
      .select("node", "rank_scaled").as[(String, Long)].collect().toMap
    assert(r1 == r2)
    // more in-mass -> more rank: b receives from a (2/3) and c (4/5)
    assert(r1("b") > r1("a"))
  }

  test("ewma: head normalization and exact hand-computed values") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
        (2L, 4L, 5.0))
      .toDF("k", "id", "v")
    val got = TimeSeries.ewma(df, "k", Seq("id"), "v", alpha = 0.5, span = 4)
      .select(col("k"), col("id"), round(col("v_ewma"), 9).as("e"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, id, e) => (k, id) -> e }.toMap
    // alpha .5: weights 1, .5, .25, .125
    assert(got((1L, 1L)) == 10.0) // series head: just the value
    assert(got((1L, 2L)) == math.rint((20.0 + 10.0 * 0.5) / 1.5 * 1e9) / 1e9)
    assert(got((1L, 3L)) ==
      math.rint((30.0 + 20.0 * 0.5 + 10.0 * 0.25) / 1.75 * 1e9) / 1e9)
    assert(got((2L, 4L)) == 5.0)
  }

  test("kmeans: separable clusters recovered, deterministic, monotone") {
    // two tight blobs far apart in 4-d; ids 0,1 seed the two clusters
    val pts = (0 until 20).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 0.0 else 10.0
      (i.toLong, Array(base + 0.001 * i, base, base - 0.001 * i, base))
    }
    val df = pts.toDF("id", "vec")
    def run(iters: Int) =
      Similarity.kmeansAssign(df, "id", "vec", k = 2, iterations = iters)
        .as[(Long, Int, Long)].collect().sortBy(_._1)
    val a2 = run(2)
    // blob membership = parity of id (seeds 0 and 1 are in different blobs)
    a2.foreach { case (id, cluster, _) =>
      assert(cluster == (id % 2).toInt, s"id $id in cluster $cluster") }
    assert(run(2).toSeq == a2.toSeq) // deterministic
    // Lloyd iterations never increase total within-cluster distance
    val wcss0 = run(0).map(_._3).sum
    val wcss2 = a2.map(_._3).sum
    assert(wcss2 <= wcss0)
  }

  test("semanticNearDupPairs: planted copies co-cluster and surface at cos 1") {
    val pts = (0 until 12).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 0.0 else 10.0
      (i.toLong, Array(base + 0.01 * i, base, base - 0.01 * i, 1.0))
    }
    val df = pts.toDF("id", "vec")
    val planted = df.select((col("id") + 100).as("id"), col("vec"))
    val pairs = Similarity.semanticNearDupPairs(df.unionByName(planted),
        "id", "vec", k = 2, iterations = 1, threshold = 0.999999)
      .as[(Long, Long, Int, Double)].collect()
    // every planted (i, i+100) pair found, in i's blob cluster
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0 until 12).foreach { i =>
      assert(found.contains((i.toLong, i + 100L)), s"copy pair $i missing")
    }
    pairs.foreach { case (_, _, _, c) => assert(c >= 0.999999) }
  }
}
