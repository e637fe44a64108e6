package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized model checks for the round-8 analytics operators: each
  * op against a brute-force plain-Scala model on seeded random input,
  * across partition layouts — the layout-independence discipline the
  * oracle gate enforces for declared queries, applied to the op APIs
  * directly. */
class AnalyticsPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("property: intervalUnion equals the O(n log n) sweep model") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val rows = Seq.tabulate(200) { _ =>
        val k = s"k${rnd.nextInt(5)}"
        val s = rnd.nextInt(500).toLong
        (k, s, s + 1 + rnd.nextInt(40))
      }
      // model: sort per key, sweep, merge on overlap-or-touch
      val model = rows.groupBy(_._1).map { case (k, ivs) =>
        val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
        val blocks = sorted.tail.foldLeft(
          List((sorted.head._1, sorted.head._2, 1L))) {
          case ((bs, be, n) :: rest, (s, e)) =>
            if (s <= be) (bs, math.max(be, e), n + 1) :: rest
            else (s, e, 1L) :: (bs, be, n) :: rest
          case (Nil, _) => Nil // unreachable
        }
        k -> blocks.reverse.map { case (s, e, n) => (s, e, n) }
      }
      val got = TimeSeries.intervalUnion(
          rows.toDF("k", "s", "e").repartition(trial * 3), "k", "s", "e")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
        .map { case (k, bs) =>
          k -> bs.map(b => (b._2, b._3, b._4)).sortBy(x => (x._1, x._2)).toList }
      assert(got == model.map { case (k, v) => k -> v.sortBy(x => (x._1, x._2)) },
        s"trial $trial")
    }
  }

  test("property: changePoint equals the brute-force scaled-CUSUM argmax") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val rows = (1 to 6).flatMap { g =>
        val n = 5 + rnd.nextInt(30)
        (1 to n).map(i => (s"g$g", i.toLong, rnd.nextInt(1000).toLong))
      }
      val model = rows.groupBy(_._1).map { case (k, vs) =>
        val xs = vs.sortBy(_._2)
        val n = xs.length.toLong
        val tot = xs.map(_._3).sum
        var cum = 0L
        val ts = xs.zipWithIndex.map { case ((_, id, v), i) =>
          cum += v
          (id, n * cum - (i + 1).toLong * tot)
        }
        val best = ts.maxBy { case (id, t) => (math.abs(t), -id) }
        k -> (best._1, best._2, n)
      }
      val got = TimeSeries.changePoint(
          rows.toDF("k", "id", "c").repartition(2 + trial), "k", "id", "c")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == model, s"trial $trial")
    }
  }

  test("property: collocations equals the brute-force PMI model") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("a", "bb", "ccc", "dd", "e")
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    def toks(t: String) =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
    val uni = docs.flatMap(d => toks(d._2))
    val bgs = docs.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq)
    val uc = uni.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val model = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3)
      .map { case ((a, b), c) =>
        val lift = (c.toDouble * uni.size * uni.size) /
          (bgs.size.toDouble * uc(a) * uc(b))
        (a, b) -> (c, BigDecimal(math.log(lift))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    val got = TextAnalysis.collocations(
        docs.toDF("id", "text").repartition(5), "text", minCount = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == model.keySet)
    got.foreach { case (k, (c, pmi)) =>
      assert(c == model(k)._1, s"count $k")
      assert(math.abs(pmi - model(k)._2) < 1e-9, s"pmi $k") }
  }
}
