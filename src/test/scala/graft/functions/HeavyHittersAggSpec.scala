package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.TextAnalysis

/** Misra-Gries sketch: the frequency guarantee (every term with
  * f > n/(m+1) survives, counters are lower bounds within n/(m+1)),
  * merge-across-partitions preservation, and the exactness of the
  * two-pass heavyHitterTerms against the naive full groupBy. */
class HeavyHittersAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Zipf-flavored corpus: term_i appears ~n/(i+1) times, plus a tail
    * of uniques to pressure the decrement path. */
  private def corpus(nHead: Int, nTail: Int): Seq[String] =
    (0 until nHead).flatMap(i => Seq.fill(nHead / (i + 1))(s"t$i")) ++
      (0 until nTail).map(i => s"u$i")

  private def exact(terms: Seq[String]): Map[String, Long] =
    terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("MG guarantee holds across partitionings") {
    val terms = corpus(40, 3000)
    val n = terms.size.toLong
    val truth = exact(terms)
    for (m <- Seq(8, 32, 128); parts <- Seq(1, 7)) {
      val sketch = terms.toDF("term").repartition(parts)
        .agg(HeavyHittersAgg.sketch(col("term"), m).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.lb"))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= m, s"m=$m parts=$parts: ${sketch.size} entries")
      val bound = n / (m + 1) + 1 // f > n/(m+1) must survive
      truth.foreach { case (t, f) =>
        if (f > n / (m + 1))
          assert(sketch.contains(t),
            s"m=$m parts=$parts: heavy term $t (f=$f, bound=$bound) missing")
      }
      sketch.foreach { case (t, c) =>
        val f = truth(t)
        assert(c <= f, s"counter above truth for $t: $c > $f")
        assert(c >= f - n / (m + 1) - 1,
          s"counter below MG error for $t: $c < $f - n/(m+1)")
      }
    }
  }

  test("heavyHitterTerms equals the naive full groupBy answer") {
    val docs = corpus(30, 500).grouped(25).map(_.mkString(" ")).toSeq
      .toDF("text")
    val got = TextAnalysis.heavyHitterTerms(docs, "text",
        minFrac = 0.01, m = 256)
      .as[(String, Long)].collect().toMap
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
    val n = toks.count()
    val want = toks.groupBy("t").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * 1000000000L >= n * 10000000L }.toMap
    assert(got == want)
  }

  test("minFrac below the sketch guarantee is rejected") {
    val docs = Seq("a b c").toDF("text")
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitterTerms(docs, "text", minFrac = 0.001, m = 100)
    }
  }

  test("inverted index: bounded postings, exact df") {
    val docs = Seq(
      (1L, "common alpha"), (2L, "common beta"), (3L, "common alpha"),
      (4L, "common"), (5L, "common beta alpha")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = 3)
      .as[(String, Long, Seq[Long])].collect()
      .map { case (t, df, p) => t -> ((df, p)) }.toMap
    assert(idx("common") == ((5L, Seq(1L, 2L, 3L)))) // df exact, postings capped
    assert(idx("alpha") == ((3L, Seq(1L, 3L, 5L))))
    assert(idx("beta") == ((2L, Seq(2L, 5L))))
  }
}
