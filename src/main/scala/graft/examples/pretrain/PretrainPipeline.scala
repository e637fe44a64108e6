package graft.examples.pretrain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Expectations
import graft.functions.{DeflateRatioExpr, UnicodeNormalizeExpr}
import graft.ops.{Dedup, Packing, Sampling, TextAnalysis}

/** End-to-end pretraining-corpus curation: the showcase composition of
  * the operator families this library adds over the reference —
  * unicode canonicalization → quality + compression-ratio filters →
  * exact dedup → fuzzy (MinHash-LSH) dedup → duplicated-span drop →
  * benchmark decontamination → context-window chunking → token-budget
  * packing. Every stage is an operator with its own oracle-checked
  * declared query and spec; this object wires them the way a real
  * ingest job would and reports per-stage survivor counts.
  *
  * Scale shape is inherited from the stages: normalization, quality,
  * compression and chunking are map-only; each dedup is
  * candidate-bucketed (never all-pairs); span stats shuffle once on
  * gram hashes; decontamination joins by gram; packing windows within
  * hash shards. The only driver-side work is the per-stage counts —
  * the count() aggregates a production job would log anyway.
  */
object PretrainPipeline {

  /** Survivor count after each stage, in pipeline order. */
  final case class StageCount(stage: String, rows: Long)

  /** @param docs       corpus (idCol, textCol, …) — extra columns ride along
    * @param evalSet    benchmark/eval texts to decontaminate against
    * @param minQuality drop docs scoring below this ([[TextAnalysis.qualityScore]])
    * @param jaccardThreshold fuzzy-dup cut ([[Dedup.minHashLshPairs]])
    * @param decontamGram word-n-gram size for eval overlap
    * @param chunkTokens / overlapTokens  context-window chunking
    * @param packBudget tokens per training bin
    * @param shards     packing parallelism (bins fill within a shard)
    * @param fuzzyMode  near-dup pair detector: "minhash"
    *                   ([[Dedup.minHashLshPairs]] — word-shingle
    *                   MinHash, the default AND what the
    *                   oracle-checked e2e query runs: its verify stage
    *                   is exact shingle-set Jaccard, so surfaced pairs
    *                   match the all-pairs SQL) or "ngram-lsh"
    *                   ([[Dedup.jaccardNgramPairsLsh]] — char-trigram
    *                   variant; beware low-vocabulary corpora, where
    *                   trigram sets converge and the buckets
    *                   degenerate — see SCALE.md)
    * @param shardExpr  packing shard override (default: xxhash64 of
    *                   chunk_uid mod `shards` — swap in a plain
    *                   modulus for cross-engine determinism)
    * @return (packed chunk frame, per-stage survivor counts) — the
    *         frame carries (idCol, chunk_id, chunk_uid, n_tokens,
    *         chunk_text, shard, bin) */
  def curate(docs: DataFrame, evalSet: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.3,
             deflateBounds: (Double, Double) = (0.05, 1.1),
             jaccardThreshold: Double = 0.9,
             maxDupFrac: Double = 0.5, spanGram: Int = 13,
             decontamGram: Int = 8,
             chunkTokens: Int = 256, overlapTokens: Int = 32,
             packBudget: Int = 1024, shards: Int = 8,
             fuzzyMode: String = "minhash",
             shardExpr: Option[Column] = None)
    : (DataFrame, Seq[StageCount]) = {
    val counts = Seq.newBuilder[StageCount]
    // Each stage is a MATERIALIZATION BARRIER (eager localCheckpoint),
    // not just a count: the survivor count is an action, and five more
    // actions follow (later stage counts + the caller's own), so a lazy
    // chain would recompute stage k's whole lineage once per downstream
    // action — the fuzzy-dedup LSH pipeline alone would run ~6×, which
    // measured as a 10-minute query at sf0.1 vs seconds checkpointed.
    // Each stage then computes exactly once and its count is a cheap
    // scan of the checkpoint. Cost: one corpus-sized executor-block
    // write per stage — what a production job persisting per-stage
    // outputs pays anyway; swap for reliable checkpoints on
    // preemptible clusters.
    def stage(name: String, df: DataFrame): DataFrame = {
      val barrier = df.localCheckpoint(true)
      counts += StageCount(name, barrier.count()); barrier
    }

    // input contract, checked up front in ONE aggregation job: a null
    // or duplicated id would silently corrupt every dedup decision and
    // chunk_uid downstream — fail here, loudly, instead
    val contract = Seq(
      Expectations.NotNull(idCol), Expectations.Unique(Seq(idCol)),
      Expectations.NotNull(textCol))
    val broken = Expectations.check(docs, contract)
      .filter(col("violations") > 0).collect()
    require(broken.isEmpty,
      "input contract violated: " + broken.map(r =>
        s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))

    // canonical spelling FIRST: every downstream hash, shingle, and
    // join sees one form of composed/decomposed text
    val normalized = docs.withColumn(textCol,
      UnicodeNormalizeExpr.unicodeNormalize(col(textCol), "NFC"))

    // two-tailed hygiene: heuristic quality score plus the deflate
    // ratio (repetition/boilerplate compresses below the floor,
    // keyboard-mash/encoded binary above the ceiling)
    val quality = stage("quality_filter", normalized.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        DeflateRatioExpr.deflateRatio(col(textCol))
          .between(deflateBounds._1, deflateBounds._2)))

    // exact dedup on the normalized fingerprint, smallest id survives
    val exact = stage("exact_dedup", Dedup.exactDeterministic(
        quality.withColumn("__fp", Dedup.normalizedHash(col(textCol))),
        Seq("__fp"), idCol)
      .drop("__fp"))

    // fuzzy dedup: of every near-dup pair (id_a < id_b) drop the
    // larger id — the canonical smallest-survivor policy
    val nearDupPairs = fuzzyMode match {
      case "minhash" => Dedup.minHashLshPairs(exact, idCol, textCol,
        jaccardThreshold = jaccardThreshold)
      case "ngram-lsh" => Dedup.jaccardNgramPairsLsh(exact, idCol,
        textCol, n = 3, threshold = jaccardThreshold)
      case other => throw new IllegalArgumentException(
        s"fuzzyMode must be minhash | ngram-lsh, got '$other'")
    }
    val dupIds = nearDupPairs
      .select(col("id_b").as(idCol)).distinct()
    val fuzzy = stage("fuzzy_dedup",
      exact.join(dupIds, Seq(idCol), "left_anti"))

    // documents that are MOSTLY duplicated spans (boilerplate stitched
    // around little fresh text) survive document-level dedup — the
    // span statistics catch them
    val spanStats = Dedup.duplicateSpans(fuzzy, idCol, textCol,
      n = spanGram)
    val spanHeavy = spanStats.filter(col("dup_frac") > maxDupFrac)
      .select(col(idCol))
    val despanned = stage("span_dedup",
      fuzzy.join(spanHeavy, Seq(idCol), "left_anti"))

    val clean = stage("decontaminate",
      Dedup.decontaminate(despanned, evalSet, idCol, textCol,
        decontamGram))

    // context-window chunks; chunk_uid is a stable per-chunk key for
    // packing (chunk_id < 2^20 per doc by construction at any sane
    // chunk size — documents are not 4-billion-token monsters)
    val chunks = stage("chunk", TextAnalysis.chunkDocuments(
        clean, idCol, textCol, chunkTokens, overlapTokens)
      .withColumn("chunk_uid",
        col(idCol).cast("long") * lit(1L << 20) + col("chunk_id")))

    val packed = stage("pack", chunks.join(
      Packing.packByTokenBudget(chunks, "chunk_uid", "chunk_text",
        shard = shardExpr.getOrElse(
          pmod(xxhash64(col("chunk_uid")), lit(shards.toLong))),
        budget = packBudget)
        .select(col("chunk_uid"), col("shard"), col("bin")),
      Seq("chunk_uid")))

    (packed, counts.result())
  }

  /** Semantic (embedding-space) near-dup removal, the vector-side
    * companion to [[curate]]'s textual dedups: PCA-reduce the
    * embeddings (one covariance pass + driver eigensolve — the only
    * cluster-shaped PCA), then run cluster-blocked SemDeDup in the
    * compact space, and return the doc ids to DROP (larger id of each
    * near-dup pair — the same smallest-survivor policy as the text
    * path). Reducing first makes the k-means blocking and the
    * pairwise cosines k-dimensional instead of d-dimensional with
    * measured-equal pair decisions at sane k (the variance the
    * dropped components carry is noise for near-IDENTICAL pairs —
    * exactly SemDeDup's premise).
    *
    * Compose: `docs.join(semanticDropIds(...), Seq(idCol), "left_anti")`
    * between [[curate]]'s fuzzy and span stages, or standalone. */
  def semanticDropIds(embeddings: DataFrame, idCol: String = "vec_id",
                      vecCol: String = "embedding", dims: Int = 64,
                      k: Int = 16, nClusters: Int = 16,
                      cosineFloor: Double = 0.995): DataFrame = {
    val reduced = graft.ops.Pca.project(
      embeddings, vecCol,
      graft.ops.Pca.fit(embeddings, vecCol, dims, k), outCol = "__pc")
    graft.ops.Similarity.semanticNearDupPairs(
        reduced.select(col(idCol), col("__pc").as(vecCol)),
        idCol, vecCol, k = nClusters, iterations = 2,
        threshold = cosineFloor)
      .select(col("id_b").as(idCol)).distinct()
  }

  /** Deterministic reviewer sample of the curated output: k packed
    * chunks per (shard, bin) — the eyeball pass every corpus release
    * ships with, reproducible across runs because membership is
    * hash-of-key ([[Sampling.reservoirPerGroup]] over the bounded
    * top-k aggregate), so reviewers diff the SAME examples between
    * pipeline versions. */
  def auditSample(packed: DataFrame, k: Int = 3): DataFrame = {
    val keyed = packed.withColumn("__grp",
      concat_ws("/", col("shard"), col("bin")))
    Sampling.reservoirPerGroup(keyed, "__grp", "chunk_uid", k)
      .join(keyed, Seq("__grp", "chunk_uid"))
      .drop("__grp")
  }
}
