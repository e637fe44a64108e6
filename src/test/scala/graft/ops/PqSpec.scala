package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // dim 8, m=2 subspaces of 4: two well-separated groups per subspace
  private def corpus = Seq(
    (0L, Array(0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0)),
    (1L, Array(0.1, 0.0, 0.1, 0.0, 9.1, 9.0, 9.1, 9.0)),
    (2L, Array(5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0)),
    (3L, Array(5.1, 5.0, 5.1, 5.0, 1.1, 1.0, 1.1, 1.0)),
    (4L, Array(0.05, 0.0, 0.05, 0.0, 1.05, 1.0, 1.05, 1.0)),
    (5L, Array(5.05, 5.0, 5.05, 5.0, 9.05, 9.0, 9.05, 9.0))
  ).toDF("id", "v")

  private def quant(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("pqSearch ADC distance equals L2 to the code reconstruction, top-k exact") {
    val m = 2; val k = 2; val iters = 1; val sub = 4
    // fitted codebooks per subspace, straight from the public fit
    val cbs = (0 until m).map { s =>
      Similarity.kmeansFit(
          corpus.select(col("id"),
            slice(col("v"), s * sub + 1, sub).as("sv")),
          "id", "sv", k, iters)
        .collect().map(r => r.getInt(0) ->
          r.getSeq[Long](1).toArray).toMap
    }
    val codes = Similarity.pqEncode(corpus, "id", "v", m, k, iters)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val vecs = corpus.as[(Long, Array[Double])].collect().toMap
    def adcBrute(q: Long, x: Long): Long = (0 until m).map { s =>
      val qs = vecs(q).slice(s * sub, (s + 1) * sub).map(quant)
      val code = if (s == 0) codes(x)._1 else codes(x)._2
      val cv = cbs(s)(code)
      qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    val got = Similarity.pqSearch(corpus, "id", "v",
        corpus.filter($"id" < 2).select($"id".as("qid"), $"v"), "qid",
        m, k, iters, topK = 6)
      .as[(Long, Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)))
      .toMap
    for (q <- Seq(0L, 1L)) {
      val expect = vecs.keys.toSeq
        .map(x => (x, adcBrute(q, x))).sortBy { case (x, d) => (d, x) }
      assert(got(q).toSeq == expect,
        s"query $q: ADC ranking must equal brute reconstruction L2")
    }
  }

  test("an exact copy of the query attains the minimal ADC distance") {
    val emb = corpus
    val got = Similarity.pqSearch(emb, "id", "v",
        emb.filter($"id" === 2L).select($"id".as("qid"), $"v"), "qid",
        m = 2, k = 2, iterations = 1, topK = 6)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    // the copy (the query row itself is in the corpus) holds rank 1:
    // its codes are per-subspace argmins, so its ADC distance is the
    // global lower bound Σ_s min_j d2(q_s, c_j)
    assert(got.head._2 == 2L && got.head._4 == got.map(_._4).min)
  }

  test("pqEncode is layout-independent and codes live in [0, k)") {
    val a = Similarity.pqEncode(corpus, "id", "v", 2, 2, 1)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.pqEncode(corpus.repartition(5), "id", "v", 2, 2, 1)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    val codes = Similarity.pqEncode(corpus, "id", "v", 2, 2, 1)
      .select("code_0", "code_1").as[(Int, Int)].collect()
    assert(codes.forall { case (c0, c1) =>
      c0 >= 0 && c0 < 2 && c1 >= 0 && c1 < 2 })
  }
}
