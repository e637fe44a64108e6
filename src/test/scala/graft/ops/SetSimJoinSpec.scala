package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SetSimJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def bruteJaccard(docs: Seq[(Long, String)],
                           t: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, s) =>
      id -> s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= t
    } yield (ia, ib)).toSet
  }

  test("jaccardJoin equals brute force at several thresholds (lossless prefix filter)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),          // identical set, jac 1
      (3L, "alpha beta gamma epsilon"),        // jac 3/5 with 1
      (4L, "zeta eta theta iota kappa"),       // disjoint from 1..3
      (5L, "zeta eta theta iota lambda mu"),   // jac 4/7 with 4
      (6L, "alpha alpha beta beta gamma"),     // dup tokens collapse: {a,b,g}
      (7L, "nu"),                              // singleton
      (8L, "nu"))                              // jac 1 with 7
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.6, 0.75, 1.0)) {
      val got = SetSimJoin.jaccardJoin(df, "doc_id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccard(docs, t), s"threshold $t")
    }
  }

  test("jaccardJoin reports exact common/size/jac and is layout-independent") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f"), (3L, "a b x y z"))
    val row = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id",
        "text", 0.6)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(row == Seq((1L, 2L, 4L, 5L, 5L, 0.666667)))
    val again = SetSimJoin.jaccardJoin(
        docs.toDF("doc_id", "text").repartition(5), "doc_id", "text", 0.6)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(again == row)
  }

  test("jaccardJoin shingle mode equals brute force over shingle sets") {
    def shingles(s: String, w: Int): Set[String] = {
      val t = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (t.length < w) Set.empty
      else t.sliding(w).map(_.mkString(" ")).toSet
    }
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),   // shares shingles "a b c","b c d","c d e"
      (3L, "f e d c b a"),   // same words reversed: word-jac 1, shingle 0
      (4L, "a b"))           // too short for 3-shingles: drops out
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val brute = (for {
        (ia, sa) <- docs.map { case (i, s) => (i, shingles(s, 3)) }
        (ib, sb) <- docs.map { case (i, s) => (i, shingles(s, 3)) }
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size
        if inter.toDouble / (sa.size + sb.size - inter) >= t
      } yield (ia, ib)).toSet
      val got = SetSimJoin.jaccardJoin(df, "doc_id", "text", t, shingle = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"threshold $t")
    }
  }

  test("jaccardJoin plan has no cartesian product") {
    val docs = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} u$i"))
    val q = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id",
      "text", 0.5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"set-similarity join must stay token-keyed:\n$p")
  }
}
