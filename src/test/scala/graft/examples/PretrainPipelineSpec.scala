package graft.examples

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.examples.pretrain.PretrainPipeline

/** End-to-end run of the curation showcase on a corpus with planted
  * exact dups, near dups, junk, and eval contamination — each stage
  * must catch exactly its planted rows and survivors must flow through
  * to packed chunks. */
class PretrainPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def words(seed: Int, n: Int, vocab: String) = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(vocab + rng.nextInt(50)).mkString(" ")
  }

  test("each curation stage drops exactly its planted rows") {
    val goodDocs = (0L until 20L).map(i =>
      (i, words(i.toInt, 120, "tok"))) // long, clean, mutually distinct
    val junk = Seq((100L, "!!! ??? !!! ,,, ...")) // punctuation soup
    val exactDup = Seq((101L, goodDocs(3)._2)) // byte-identical to doc 3
    val nearDup = Seq((102L, goodDocs(4)._2 + " tail")) // jaccard ≈ 0.99 vs doc 4
    val contaminated = Seq((103L, words(900, 120, "evl")))
    // degenerate compression: one token repeated — deflate ratio
    // collapses under the floor, even though the length-based quality
    // score passes
    val zeroEntropy = Seq((104L, Seq.fill(120)("tok1").mkString(" ")))
    // span-heavy: a fresh head stapled onto one paragraph repeated
    // three times — token-set jaccard vs anything is low (its vocab is
    // its own) and the repetition is too word-diverse to sink the
    // deflate ratio below the floor, but most of its 13-gram SPANS
    // recur within the document itself
    val para = words(770, 40, "rep")
    val spanHeavy = Seq((105L,
      words(771, 10, "new") + " " + Seq.fill(3)(para).mkString(" ")))
    val docs = (goodDocs ++ junk ++ exactDup ++ nearDup ++ contaminated ++
      zeroEntropy ++ spanHeavy)
      .toDF("doc_id", "text")
    val evalSet = Seq((1L, words(900, 120, "evl"))) // shares grams with 103
      .toDF("doc_id", "text")

    val (packed, counts) = PretrainPipeline.curate(
      docs, evalSet,
      minQuality = 0.5, jaccardThreshold = 0.9,
      maxDupFrac = 0.5, spanGram = 13, decontamGram = 8,
      chunkTokens = 64, overlapTokens = 16, packBudget = 128, shards = 2)

    val byStage = counts.map(c => c.stage -> c.rows).toMap
    // of 26: junk gone (scores 0.4) AND the zero-entropy doc gone
    // (deflate ratio under the floor)
    assert(byStage("quality_filter") == 24)
    assert(byStage("exact_dedup") == 23) // planted copy gone, doc 3 kept
    assert(byStage("fuzzy_dedup") == 22) // near-copy gone, doc 4 kept
    // span-heavy doc gone: its repeated paragraph makes most of its
    // own 13-gram spans corpus-duplicates (within-doc repeats count)
    assert(byStage("span_dedup") == 21)
    assert(byStage("decontaminate") == 20) // contaminated doc gone
    // 20 docs × 120 tokens: starts 1/49/97 (bounded at 120−16) → 3 each
    assert(byStage("chunk") == 60)
    assert(byStage("pack") == 60) // packing labels bins, never drops

    assert(packed.select("doc_id").as[Long].collect().toSet ==
      (0L until 20L).toSet, "only the 20 good docs survive")
  }

  test("input contract gate rejects duplicate ids loudly") {
    val docs = Seq((1L, words(1, 120, "tok")), (1L, words(2, 120, "tok")))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      PretrainPipeline.curate(docs,
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("unique(doc_id)=1"), e.getMessage)
  }

  test("auditSample: k chunks per bin, stable across runs") {
    val docs = (0L until 30L).map(i => (i, words(i.toInt, 100, "w")))
      .toDF("doc_id", "text")
    val (packed, _) = PretrainPipeline.curate(
      docs, Seq.empty[(Long, String)].toDF("doc_id", "text"),
      minQuality = 0.0, jaccardThreshold = 0.99, decontamGram = 8,
      chunkTokens = 50, overlapTokens = 0, packBudget = 120, shards = 3)
    val s1 = PretrainPipeline.auditSample(packed, 2)
    val binSizes = s1.groupBy("shard", "bin").count().collect()
    val full = packed.groupBy("shard", "bin").count().collect()
      .map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    binSizes.foreach { r =>
      val want = math.min(2L, full((r.get(0), r.get(1))))
      assert(r.getLong(2) == want, s"bin ${(r.get(0), r.get(1))}") }
    assert(binSizes.length == full.size, "every bin sampled")
    // reproducible: the sample is a pure function of the keys
    val s2 = PretrainPipeline.auditSample(packed, 2)
    assert(s1.select("chunk_uid").collect().map(_.getLong(0)).toSet ==
      s2.select("chunk_uid").collect().map(_.getLong(0)).toSet)
  }

  test("packed bins respect the token budget up to one straddling doc") {
    val docs = (0L until 30L).map(i => (i, words(i.toInt, 100, "w")))
      .toDF("doc_id", "text")
    val (packed, _) = PretrainPipeline.curate(
      docs, Seq.empty[(Long, String)].toDF("doc_id", "text"),
      minQuality = 0.0, jaccardThreshold = 0.99, decontamGram = 8,
      chunkTokens = 50, overlapTokens = 0, packBudget = 120, shards = 3)
    // bins fill in chunk_uid order within a shard: every bin's token
    // total stays under budget + one chunk (the straddle allowance)
    val over = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as("biggest"))
      .filter(col("tot") > lit(120L) + col("biggest"))
    assert(over.count() == 0)
    // chunks of one doc keep dense chunk ids for reassembly
    val ids = packed.filter(col("doc_id") === 7L)
      .select("chunk_id").as[Int].collect().sorted.toSeq
    assert(ids == Seq(0, 1))
  }

  test("semanticDropIds: PCA-reduced SemDeDup drops planted near-copies only") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // plant exact copies under shifted ids: each pair (v, v+100000)
    // is cosine-1.0 in ANY linear projection, so the PCA-space pass
    // must find them; distinct original vectors at cosine < floor
    // must survive
    val planted = emb.unionByName(emb.limit(20)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val drops = PretrainPipeline.semanticDropIds(planted,
        dims = 64, k = 12, nClusters = 4, cosineFloor = 0.9999)
      .as[Long].collect().toSet
    // every planted copy's LARGER id is dropped; no original is
    assert(drops.nonEmpty && drops.forall(_ >= 100000L),
      s"unexpected drops: ${drops.filter(_ < 100000L)}")
    assert(drops.size == 20, s"expected all 20 copies flagged, got ${drops.size}")
  }
}
