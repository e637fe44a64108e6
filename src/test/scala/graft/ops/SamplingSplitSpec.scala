package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dataset split, temperature sampling, and BPE pair counts. */
class SamplingSplitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("datasetSplit partitions exactly and is repartition-stable") {
    val df = spark.range(0, 10000).toDF("id")
    val s = Sampling.datasetSplit(df, "id", 80, 10)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L) // a partition, no loss/duplication
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // ~80/10/10 within loose tolerance (hash uniformity, not RNG)
    assert(math.abs(counts("train") - 8000L) < 400,
      s"train share off: ${counts("train")}")
    val again = Sampling.datasetSplit(df.repartition(7), "id", 80, 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
    // membership (not just counts) is key-stable
    val m1 = s.filter(col("split") === "val").select("id")
      .as[Long].collect().sorted.toSeq
    val m2 = Sampling.datasetSplit(df.repartition(3), "id", 80, 10)
      .filter(col("split") === "val").select("id")
      .as[Long].collect().sorted.toSeq
    assert(m1 == m2)
  }

  test("temperatureSample: tau > 1 upweights small domains; budget is honored") {
    // heavily skewed domains: big=9000, small=1000
    val df = (0 until 9000).map(i => (i.toLong, "big")) ++
      (9000 until 10000).map(i => (i.toLong, "small"))
    val d = df.toDF("id", "dom")
    val kept = Sampling.temperatureSample(d, "dom", "id",
        budgetPerMille = 500, tau = 2.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    val total = kept.values.sum
    assert(total <= 5600 && total >= 4400, s"budget ~50% violated: $total")
    // natural shares are 90/10; tau=2 targets sqrt-proportions 75/25
    val smallShare = kept("small").toDouble / total
    assert(smallShare > 0.18 && smallShare < 0.32,
      s"small-domain share not temperature-boosted: $smallShare")
    // deterministic across layouts
    val again = Sampling.temperatureSample(d.repartition(5), "dom", "id",
        budgetPerMille = 500, tau = 2.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("bpePairCounts: hand-computed weighted pair counts") {
    // "ab ab abc x" -> wf: ab=2, abc=1; x dropped (len<2)
    val docs = Seq("ab ab abc", "x").toDF("text")
    val got = TextAnalysis.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 3L, "bc" -> 1L))
  }

  test("tfidfCosineJoin: rearranged near-dup found; stopword-only overlap is not a pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta common"),
      (2L, "delta gamma beta alpha common"), // rearranged copy of 1
      (3L, "epsilon zeta eta theta common"), // shares only the stopword
      (4L, "alpha beta iota kappa common"))  // partial overlap with 1
      .toDF("doc_id", "text")
    // df cap 3 cuts 'common' (df=4): it neither scores nor blocks
    val pairs = TextAnalysis.tfidfCosineJoin(docs, "doc_id", "text",
        threshold = 0.9, maxDf = 3L)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got $pairs") // word order irrelevant
    assert(pairs((1L, 2L)) > 0.999) // identical bags => cosine ~ 1
    // determinism across layouts
    val again = TextAnalysis.tfidfCosineJoin(
        docs.repartition(5), "doc_id", "text",
        threshold = 0.9, maxDf = 3L)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(again == pairs)
  }

  test("systematicSample: ~n PPS rows, heavy rows always in, layout-independent") {
    import spark.implicits._
    val rows = (1L to 1000L).map(i => (i, if (i == 500) 5000.0 else 1.0))
    val df = rows.toDF("k", "w")
    val n = 50
    val s = Sampling.systematicSample(df, "k", "w", n)
      .as[(Long, Double)].collect().map(_._1).toSet
    // W = 999 + 5000 = 5999, step ≈ 120: the heavy row spans ~41 steps
    // but is emitted once; light rows contribute the rest
    assert(s.contains(500L), "heavy row (83% of mass) must be selected")
    assert(s.size >= n / 5 && s.size <= n,
      s"expected roughly n distinct selections, got ${s.size}")
    // zero/negative weights are never selected
    val withZero = (df.as[(Long, Double)].collect().toSeq :+ (2000L, 0.0) :+
      (2001L, -3.0)).toDF("k", "w")
    val s2 = Sampling.systematicSample(withZero, "k", "w", n)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(!s2.contains(2000L) && !s2.contains(2001L))
    assert(s2 == s, "appending unselectable rows must not change the sample")
    // pure function of the data: repartitioned layout, same selection
    val s3 = Sampling.systematicSample(df.repartition(7), "k", "w", n)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(s3 == s)
  }

  test("string keys split via the xxhash64 path instead of degenerating to all-test") {
    // the cast("long") a string id silently nulls used to land EVERY
    // row in "test" — the crawl-curation URL-id case
    val df = (0 until 2000).map(i => s"https://example.com/doc/$i")
      .toDF("url")
    val s = Sampling.datasetSplit(df, "url", 80, 10)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(counts.getOrElse("train", 0L) > 1200L,
      s"string keys must spread across buckets, got $counts")
    assert(counts.keySet == Set("train", "val", "test"))
    // membership is layout-stable (xxhash64 is a pure value function)
    val v1 = s.filter(col("split") === "val").select("url")
      .as[String].collect().sorted.toSeq
    val v2 = Sampling.datasetSplit(df.repartition(7), "url", 80, 10)
      .filter(col("split") === "val").select("url")
      .as[String].collect().sorted.toSeq
    assert(v1 == v2)
    // leakageSafeSplit with string ids: clusters stay atomic
    val pairs = Seq(("https://example.com/doc/1", "https://example.com/doc/2"))
      .toDF("id_a", "id_b")
    val ls = Sampling.leakageSafeSplit(df, "url", pairs, 80, 10)
    val dupSplits = ls.filter(col("url").isin(
        "https://example.com/doc/1", "https://example.com/doc/2"))
      .select("split").distinct().count()
    assert(dupSplits == 1L, "paired string docs must co-assign")
    assert(ls.groupBy("split").count().count() == 3L)
    // an unsplittable key type refuses loudly (no silent null-cast)
    val bad = Seq((Seq(1, 2), 1)).toDF("arr", "v")
    val e = intercept[IllegalArgumentException] {
      Sampling.datasetSplit(bad, "arr", 80, 10)
    }
    assert(e.getMessage.contains("numeric or timestamp key"))
  }

  test("leakageSafeSplit property: random pair graphs, components never straddle") {
    // model components with union-find; the engine must (a) keep every
    // component on one side, (b) side = hash of the component's MIN id,
    // (c) leave non-component ids exactly where datasetSplit puts them
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 400L
      val pairs = Vector.fill(60)(
        (rnd.nextLong(n), rnd.nextLong(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val df = spark.range(0, n).toDF("id")
      val got = Sampling.leakageSafeSplit(df, "id",
          pairs.toDF("id_a", "id_b"), 70, 15)
        .select("id", "split", "split_unit")
        .as[(Long, String, Long)].collect()
      assert(got.length == n)
      val bySplit = got.map(r => r._1 -> r._2).toMap
      val byUnit = got.map(r => r._1 -> r._3).toMap
      val plain = Sampling.datasetSplit(df, "id", 70, 15)
        .select("id", "split").as[(Long, String)].collect().toMap
      val inComponent = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      (0L until n).foreach { i =>
        if (inComponent.contains(i)) {
          val root = find(i)
          assert(byUnit(i) == root,
            s"trial=$trial id=$i unit ${byUnit(i)} != component min $root")
          assert(bySplit(i) == bySplit(root),
            s"trial=$trial id=$i split differs from its component root")
        } else {
          assert(byUnit(i) == i && bySplit(i) == plain(i),
            s"trial=$trial singleton $i moved")
        }
      }
    }
  }

  test("leakageSafeSplit: duplicate clusters never straddle the split fence") {
    val df = spark.range(0, 5000).toDF("id")
    // chained pairs: (1,2),(2,3) puts 1,2,3 in ONE unit even though
    // (1,3) never paired — transitive closure, the property a pairwise
    // guard would miss; plus an isolated pair deep in the id space
    val pairs = Seq((1L, 2L), (2L, 3L), (4000L, 4777L))
      .toDF("id_a", "id_b")
    val s = Sampling.leakageSafeSplit(df, "id", pairs, 80, 10)
    val bySplit = s.select("id", "split").as[(Long, String)]
      .collect().toMap
    assert(Set(bySplit(1L), bySplit(2L), bySplit(3L)).size == 1,
      "chained near-dups split across the fence (eval leakage)")
    assert(bySplit(4000L) == bySplit(4777L))
    // the cluster's side is the GROUP label's side — members follow
    // the min id, not their own hash
    assert(bySplit(2L) == bySplit(1L) && bySplit(3L) == bySplit(1L))
    // everything else splits as datasetSplit would (units = own id)
    val plain = Sampling.datasetSplit(df, "id", 80, 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    val grouped = Set(1L, 2L, 3L, 4000L, 4777L)
    assert(df.select("id").as[Long].collect()
      .filterNot(grouped).forall(i => bySplit(i) == plain(i)))
    // partition: no rows lost or duplicated; split_unit rides along
    assert(s.count() == 5000L)
    assert(s.filter(col("split_unit") === 1L).count() == 3L)
  }
}
