package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.BpeEncodeExpr

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ranksOf(merges: Seq[(String, String)]) = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, Integer.valueOf(i)) }
    m
  }

  test("bpeTrain learns the classic hand-computed merge sequence") {
    // corpus: "aaab" x3, "aab" x1 → pair counts round 1:
    // (a,a): 2*3 + 1 = 7, (a,b): 3 + 1 = 4 → merge (a,a)
    // round 2 states: [aa,a,b]x3, [aa,b]x1 → (aa,a)=3, (a,b)=3, (aa,b)=1
    //   tie 3 vs 3 → lexicographic: (a,b) < (aa,a) → merge (a,b)
    val docs = Seq("aaab aaab aaab aab").toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 3)
    assert(merges.take(2) == Seq(("a", "a"), ("a", "b")))
    // merge 3 state: [aa,ab]x3, [aa,b]x1 → (aa,ab)=3 > (aa,b)=1
    assert(merges(2) == (("aa", "ab")))
  }

  test("encode applies learned merges; unseen symbols pass through") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = Seq("aaab aab xyzaab")
      .toDF("text")
      .select(BpeEncodeExpr.bpeEncode(lower(trim($"text")), merges))
      .as[Seq[String]].head()
    // aaab → aa+ab → aaab; aab → aa, b (a,b merged first? rank(a,b)=1:
    // a a b → (a,a)@0 → aa, b — then (aa,b) unlearned → [aa, b];
    // xyzaab: x y z a a b → x y z aa b
    assert(got == Seq("aaab", "aa", "b", "x", "y", "z", "aa", "b"))
  }

  test("encoding a training word reproduces the trainer's final symbols") {
    val docs = Seq("low lower lowest low low newer new wider")
      .toDF("text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 8)
    val ranks = ranksOf(merges)
    // re-derive the trainer's final state by sequentially applying
    // merges in rank order
    def sequential(w: String): Seq[String] = {
      var syms = w.map(_.toString).toBuffer
      for ((a, b) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out
      }
      syms.toSeq
    }
    for (w <- Seq("low", "lower", "lowest", "newer", "new", "wider"))
      assert(BpeEncodeExpr.encodeWord(w, ranks).toSeq == sequential(w),
        s"word $w: greedy encode must equal sequential merge application")
  }

  test("q-shape: encode is layout-independent and deterministic") {
    val docs = (1L to 50L)
      .map(i => (i, s"alpha beta gamma${i % 5} delta alpha beta"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 10)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id",
        BpeEncodeExpr.bpeEncode(lower(trim($"text")), merges).as("t"))
      .select($"doc_id", concat_ws("|", $"t").as("s"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(7)))
    val again = TextAnalysis.bpeTrain(docs.repartition(3), "text", 10)
    assert(again == merges, "training must be layout-independent")
  }
}
