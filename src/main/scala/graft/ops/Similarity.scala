package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * Vector math uses codegen'd higher-order functions (`zip_with` +
  * `aggregate`) in double precision — sequential fold order matches
  * DuckDB's list functions, so results are bit-reproducible for the
  * oracle. No UDFs in the hot path.
  */
object Similarity {

  /** Dot product in double precision: a fused native kernel
    * ([[graft.functions.DotProductExpr]]) with the same sequential
    * accumulation order as an `aggregate` fold — deterministic and
    * oracle-stable, minus the per-pair intermediate arrays. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null (not NaN) for zero-norm vectors — NaN
    * sorts ABOVE all values in Spark's descending order and compares
    * `>= threshold` as true, so an all-zero vector would otherwise
    * become everyone's rank-1 neighbor. Null ranks last and fails
    * threshold filters. */
  def cosine(a: Column, b: Column): Column =
    safeDiv(dot(a, b), norm(a) * norm(b))

  private def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0.0d, num / den)

  /** Per-query top-k over a scored candidate frame
    * (query_id, neighbor_id, cos) via the bounded custom aggregate:
    * `minK` on struct(−cos, id) keeps the k best candidates with
    * (cos desc, id asc) order — at most k values per query per
    * partition cross the shuffle, combined map-side. The former
    * `row_number() OVER (PARTITION BY query_id ORDER BY ...)` form
    * shuffled and SORTED every scored candidate (|queries|·|corpus|
    * rows for the brute-force path) to keep k of them — the measured
    * bottleneck shape at scale. Negating the double is an exact sign
    * flip, so emitted cosines are bit-identical to the window form.
    * Null cosines (zero-norm vectors, see [[cosine]]) are excluded —
    * a degenerate vector is not a neighbor. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.filter(col("cos").isNotNull)
      .groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopKAgg.minK(
        struct((-col("cos")).as("nc"), col("neighbor_id").as("id")), k)
        .as("__nn"))
      .select(col("query_id"),
        posexplode(col("__nn")).as(Seq("__pos", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        (-col("__s.nc")).as("cos"))

  /** Unit-normalized copy of `v` (`n` = its precomputed norm); zero
    * vectors pass through unchanged. On the unit sphere
    * |a−b|² = 2−2·cos(a,b), so L2 cell geometry becomes MONOTONE in
    * cosine — the reason IVF trains and assigns on normalized vectors
    * (spherical k-means) while scoring keeps the raw cosine. */
  private def unit(v: Column, n: Column): Column =
    when(n > 0.0d, transform(v, x => x / n)).otherwise(v)

  /** Brute-force top-k: for every query row, the k nearest corpus rows by
    * cosine. The query side is broadcast (queries << corpus); the corpus
    * streams through one pass — at scale this is a map-side nested loop,
    * no shuffle until the per-query top-k aggregation. Norms are
    * precomputed per row, not per pair (3× fewer flops; identical IEEE
    * result — the per-pair cosine divides the same dot by the same two
    * sqrt values).
    *
    * Output: (query_id, neighbor_id, rank, cos) with rank 1..k,
    * cosine-desc, neighbor-id tiebreak. Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, queryIdCol: String,
                     corpusIdCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries
      .select(col(queryIdCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
    val c = corpus
      .select(col(corpusIdCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        safeDiv(dot(col("__qv"), col("__cv")), col("__qn") * col("__cn")))
    topKPerQuery(scored, k)
  }

  /** kNN majority-vote classification: each query takes the modal
    * label among its k nearest corpus neighbors (exact cosine) — the
    * standard label-propagation/auto-tagging shape for curation
    * (topic/domain tagging of new docs from a labeled seed set).
    * Deterministic tie-breaks everywhere: neighbor rank ties on
    * (cos desc, id), vote ties on (votes desc, label asc). Output:
    * (query_id, predicted_label, votes).
    *
    * Scale shape: neighbor generation is [[bruteForceTopK]] (queries
    * broadcast, corpus one pass — swap in lshTopK/ivfTopK for big
    * query sets); the label lookup joins k·|queries| rows against the
    * corpus keyed by id, and the vote itself is queries-sized. */
  def knnClassify(queries: DataFrame, corpus: DataFrame,
                  queryIdCol: String, corpusIdCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(queries, corpus, queryIdCol, corpusIdCol,
      vecCol, k)
    val labels = corpus.select(col(corpusIdCol).as("neighbor_id"),
      col(labelCol).as("__lbl"))
    val votes = nn.join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("__lbl").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__lbl").as("predicted_label"),
        col("votes"))
  }

  /** SplitMix64 finalizer (public-domain constant set): full-avalanche
    * bijective mixer, stable by construction on every JVM. Shared with
    * [[Pca.randomProjection]]'s Rademacher matrix. */
  private[ops] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane p,
    * dimension d gets a fixed hash-derived value in [-1, 1). Generated as
    * a literal array — tiny, driver-side, seeded.
    *
    * Each element is a SplitMix64 finalizer of the packed (seed, p, d)
    * key — NOT `new java.util.Random(packedKey).nextDouble()`: the
    * first draw of java.util.Random barely mixes structured seeds, and
    * seeds differing only in the p/table bits produced essentially THE
    * SAME hyperplane (measured pairwise plane cosines of 1.000 within
    * a table — every "independent" table was one plane, and LSH
    * recall@10 sat at 0.64 where decorrelated planes give 0.99). */
  private def planes(nPlanes: Int, dim: Int, seed: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val z = mix64((seed.toLong << 40) ^ (p.toLong << 20) ^ d.toLong)
        (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of dot product).
    * Vectors in the same bucket are likely near in cosine. Each plane
    * projection is one fused [[dot]] kernel call (codegen'd, no
    * intermediate zip_with array per plane — measured ~2× on the
    * bucketed near-dup query). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int,
                seed: Int = 42): Column = {
    val v = vec.cast("array<double>")
    val bits = planes(nPlanes, dim, seed).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine ≥ threshold. Brute-force variant — exact, O(n²) pairs;
    * correct baseline and oracle-checkable. At corpus scale use
    * [[lshNearDupPairs]]. */
  def bruteForceNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    val base = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val withNorm = base.withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
    val a = withNorm.select(col(idCol).as("id_a"), col("__v").as("__va"),
      col("__n").as("__na"))
    val b = withNorm.select(col(idCol).as("id_b"), col("__v").as("__vb"),
      col("__n").as("__nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        safeDiv(dot(col("__va"), col("__vb")), col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Project (id, cast vector, norm, table, bucket) — the shared prefix
    * of the LSH operators. The cast and norm are materialized columns so
    * the per-plane lambdas don't recompute them (lambda inlining — see
    * Dedup.shingleHashes). */
  private def lshBucketed(df: DataFrame, idCol: String, vecCol: String,
                          idAs: String, vecAs: String, normAs: String,
                          dim: Int, nPlanes: Int, nTables: Int): DataFrame =
    df.select(col(idCol).as(idAs),
        col(vecCol).cast("array<double>").as(vecAs))
      .withColumn(normAs, sqrt(dot(col(vecAs), col(vecAs))))
      .select(col(idAs), col(vecAs), col(normAs), posexplode(
        array((0 until nTables).map(t =>
          lshBucket(col(vecAs), nPlanes, dim, seed = 42 + t)): _*))
        .as(Seq("table", "bucket")))

  /** Embedding-cosine near-dup via sign-LSH prefilter: only pairs
    * sharing a bucket in some table are scored. The 100 TB path — the
    * all-pairs product never materializes; work is per-(table, bucket).
    * The bucketed frame is computed ONCE and checkpointed, then both
    * self-join sides are cheap renames of the cached blocks —
    * nPlanes × nTables projections per vector instead of twice that,
    * and a pushdown barrier for the join's inferred filters. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, dim: Int,
                      nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val bucketed = lshBucketed(df, idCol, vecCol, "id_a", "__va", "__na",
      dim, nPlanes, nTables).localCheckpoint(true)
    val a = bucketed
    val b = bucketed.select(col("id_a").as("id_b"), col("__va").as("__vb"),
      col("__na").as("__nb"), col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (safeDiv(dot(col("__va"), col("__vb")), col("__na") * col("__nb"))).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }

  /** Largest absolute component of a vector — the scale basis for
    * max-abs quantization. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x)))

  /** Max-abs int8 quantization: q_i = round(x_i / maxAbs · 127), the
    * storage form that cuts an embedding corpus 4-8× (float32/64 →
    * int8 + one scale per vector) with ~0.5% cosine error — standard
    * practice before shipping embeddings to an ANN index. Zero vectors
    * quantize to all-zero. Dequantize with q_i · (maxAbs / 127).
    * Pure column algebra (codegen'd), no UDF. */
  def quantizeInt8(vec: Column, maxAbsVal: Column): Column =
    when(maxAbsVal === 0.0d || maxAbsVal.isNull,
      transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x =>
        round(x / maxAbsVal * lit(127.0d)).cast("int")))

  /** Per-group element-wise mean embedding (class centroids) — the
    * labeled-data reduction behind centroid classifiers, per-domain
    * "typical document" probes, and seeding clustering from existing
    * labels. Output: (groupCol, n, centroid array<double>).
    *
    * Scale shape: posexplode → one partial-agg groupBy on
    * (group, position) — dims × groups cells, each a partial-summed
    * avg (map-side combine carries (sum, count), so the shuffle moves
    * one row per (group, pos) per map task, never per input vector) —
    * then a groups-sized reassembly groupBy. No collect, no window
    * over the corpus; skew-free (every vector contributes the same
    * `dim` cells). Vectors are averaged as doubles regardless of the
    * stored float width.
    *
    * Assumes uniform dimensionality per group (the embeddings-table
    * contract). If upstream corruption makes vectors ragged, each
    * position averages over the vectors that HAVE it (no error), the
    * centroid is as long as the longest vector, and `n` — defined as
    * the maximum per-position support — is the group's vector count
    * only in the uniform case. Groups whose vectors are all empty or
    * null produce no output row (nothing to explode). */
  def labelCentroids(df: DataFrame, groupCol: String,
                     vecCol: String): DataFrame = {
    val ex = df.select(col(groupCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__v")))
    val cells = ex.groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__v")).as("__m"), count(lit(1)).as("__n"))
    cells.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("centroid"))
  }

  // ------------------------------------------------------------- IVF

  /** Centroid affinity score: |c|² − 2·v·c. Equals squared L2 distance
    * minus the per-row constant |v|², so argmin/ordering over centroids
    * is identical — but it needs only one fused dot product per centroid
    * (native [[graft.functions.DotProductExpr]] kernel) instead of a
    * zip_with intermediate array per centroid per row. */
  private def cellScore(v: Column, centroid: Seq[Double]): Column =
    lit(centroid.map(x => x * x).sum) -
      lit(2.0d) * dot(v, array(centroid.map(lit): _*))

  /** Cell assignment: index of the nearest centroid (argmin over the
    * centroid literals — k fused dot products inside codegen, no UDF). */
  private def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(cellScore(v, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** The nProbe nearest cells, as an array of cell ids. */
  private def nearestCells(v: Column, centroids: Seq[Seq[Double]],
                           nProbe: Int): Column =
    slice(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(cellScore(v, c).as("d"), lit(i).as("i"))
    }: _*)), 1, nProbe).getField("i")

  /** Train IVF centroids with Lloyd iterations, entirely in DataFrame
    * algebra: assignment is a codegen'd argmin, the update step is an
    * explode + groupBy(cell, dim) average — both shuffle-bounded. Only
    * the k×dim centroid matrix ever reaches the driver. Training is
    * SPHERICAL: vectors are unit-normalized first, so cells partition
    * by direction — the geometry cosine search needs (L2 on raw
    * vectors clusters by magnitude too, and recall against a cosine
    * ground truth collapses: measured 0.53 → 1.0 recall@10 on the
    * embeddings fixture). Seeding is deterministic (hash-ordered
    * corpus sample); averages are float-order dependent across cluster
    * layouts, which perturbs centroids by ulps — irrelevant for an ANN
    * index (no oracle). */
  def ivfTrain(corpus: DataFrame, vecCol: String, nCentroids: Int,
               iterations: Int = 3, trainSampleMod: Int = 1): Seq[Seq[Double]] = {
    val raw = col(vecCol).cast("array<double>")
    val v = unit(raw, sqrt(dot(raw, raw)))
    // Train on a deterministic hash-slice of the corpus (standard IVF
    // practice — centroids need a representative sample, not every
    // vector): the filter hashes the vector VALUE, so the sample is
    // stable across partitioning/layout. The projected sample is
    // checkpointed once; every Lloyd pass then reads cached blocks
    // instead of rescanning (and re-casting) the corpus.
    val projected = corpus.select(v.as("v"))
    var sampled = (if (trainSampleMod > 1)
        projected.filter(pmod(xxhash64(col("v")), lit(trainSampleMod)) === 0)
      else projected).localCheckpoint(true)
    var centroids: Seq[Seq[Double]] = sampled
      .orderBy(xxhash64(col("v")))
      .limit(nCentroids)
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    // A small corpus can leave the hash slice with fewer vectors than
    // centroids (or none — empty centroid lists break the argmin
    // expression downstream): fall back to training on everything.
    if (centroids.size < nCentroids && trainSampleMod > 1) {
      sampled = projected.localCheckpoint(true)
      centroids = sampled.orderBy(xxhash64(col("v"))).limit(nCentroids)
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
    }
    for (_ <- 0 until iterations) {
      val sums = sampled
        .select(nearestCell(col("v"), centroids).as("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m")).toSeq
          case None => old // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** IVF ANN top-k: corpus vectors live in their nearest centroid's
    * cell (assignment on unit-normalized vectors — see [[ivfTrain]];
    * scoring keeps raw-vector cosine, which is identical); each query
    * probes its `nProbe` nearest cells and scores only those
    * candidates. The learned-bucket upgrade over [[lshTopK]] for
    * skewed embedding distributions — candidate work follows the
    * data's cluster structure instead of fixed hyperplanes.
    *
    * `corpusSpill` > 1 assigns each corpus vector to its `corpusSpill`
    * nearest cells (IVF "spilled" assignment): the index grows by that
    * factor, but a true neighbor sitting just across a cell boundary —
    * the dominant recall loss — is found through either cell.
    *
    * Quality floor (pinned by OpsSpec): recall@10 ≥ 0.9 vs
    * [[bruteForceTopK]] on the embeddings fixture at the declared
    * q_ann_ivf parameters (nCentroids=16, nProbe=6, corpusSpill=2,
    * iterations=2, trainSampleMod=4). The fixture is ISOTROPIC random
    * data — no cluster structure to exploit, the worst case for IVF
    * (recall is bounded by the corpus fraction probed); on real
    * embedding corpora, whose neighbors concentrate in few cells, the
    * same parameters give higher recall from far fewer candidates. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, queryIdCol: String,
              corpusIdCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              iterations: Int = 3, trainSampleMod: Int = 1,
              corpusSpill: Int = 1): DataFrame =
    ivfTopKWith(
      ivfTrain(corpus, vecCol, nCentroids, iterations, trainSampleMod),
      queries, corpus, queryIdCol, corpusIdCol, vecCol, k, nProbe,
      corpusSpill)

  /** [[ivfTopK]] served from PRE-TRAINED centroids — the fit-once/
    * serve-many path of a persisted plain-IVF index
    * ([[AnnIndex.saveIvf]]/[[AnnIndex.loadIvf]]): assignment + cell
    * join + cosine scoring only, no Lloyd work. The index is JUST the
    * k×dim centroid matrix — corpus cell assignment is a map-side
    * argmin at serve time, so the index stays metadata-sized and
    * never goes stale against a growing corpus. [[ivfTopK]] delegates
    * here, so trained-then-served and fit+serve are equal by
    * construction. */
  def ivfTopKWith(centroids: Seq[Seq[Double]], queries: DataFrame,
                  corpus: DataFrame, queryIdCol: String,
                  corpusIdCol: String, vecCol: String, k: Int,
                  nProbe: Int = 4, corpusSpill: Int = 1): DataFrame = {
    val c = corpus
      .select(col(corpusIdCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .withColumn("cell",
        if (corpusSpill <= 1)
          nearestCell(unit(col("__cv"), col("__cn")), centroids)
        else
          explode(nearestCells(unit(col("__cv"), col("__cn")), centroids,
            corpusSpill)))
    val q = queries
      .select(col(queryIdCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      .select(col("query_id"), col("__qv"), col("__qn"),
        explode(nearestCells(unit(col("__qv"), col("__qn")), centroids,
          nProbe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (safeDiv(dot(col("__qv"), col("__cv")), col("__qn") * col("__cn"))).as("cos"))
      .distinct()
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed ANN top-k: like [[bruteForceTopK]] but candidates are
    * restricted to corpus vectors sharing the query's bucket in any of
    * `nTables` independent hash tables. At 100 TB this turns the
    * all-pairs scan into a per-bucket join; recall is tunable via
    * (nPlanes, nTables, probeHamming).
    *
    * MULTI-PROBE: with `probeHamming = 1` each query also probes every
    * bucket one bit-flip away (nPlanes extra buckets per table). The
    * per-table hit probability for a neighbor with per-plane agreement
    * p rises from p^nPlanes to p^nPlanes + nPlanes·p^(nPlanes-1)(1−p) —
    * the standard way to buy recall without shrinking nPlanes (bigger
    * buckets) or adding tables (another full corpus projection pass):
    * only the QUERY side fans out, and queries ≪ corpus.
    *
    * Quality floor (pinned by OpsSpec): recall@10 ≥ 0.9 vs
    * [[bruteForceTopK]] on the embeddings fixture at the declared
    * q_ann_lsh parameters (nPlanes=4, nTables=8, probeHamming=1). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, queryIdCol: String,
              corpusIdCol: String, vecCol: String, k: Int, dim: Int,
              nPlanes: Int = 12, nTables: Int = 4,
              probeHamming: Int = 1): DataFrame = {
    val q = probedQueryBuckets(queries, queryIdCol, vecCol, dim,
      nPlanes, nTables, probeHamming)
    val c = lshBucketed(corpus, corpusIdCol, vecCol, "neighbor_id", "__cv",
      "__cn", dim, nPlanes, nTables)
    // queries ≪ corpus: broadcasting the probed query buckets keeps
    // the corpus side map-local — its nTables bucket copies (vectors
    // included) never cross an exchange
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (safeDiv(dot(col("__qv"), col("__cv")), col("__qn") * col("__cn"))).as("cos"))
      .distinct()
    topKPerQuery(scored, k)
  }

  /** Query-side LSH bucketing with the Hamming-1 multi-probe fanout —
    * ONE definition shared by [[lshTopK]] (corpus bucketed inline) and
    * [[lshTopKWith]] (corpus buckets loaded from a persisted index),
    * so the spec-pinned "indexed == inline" guarantee cannot drift. */
  private def probedQueryBuckets(queries: DataFrame, queryIdCol: String,
                                 vecCol: String, dim: Int, nPlanes: Int,
                                 nTables: Int,
                                 probeHamming: Int): DataFrame = {
    val q0 = lshBucketed(queries, queryIdCol, vecCol, "query_id", "__qv",
      "__qn", dim, nPlanes, nTables)
    if (probeHamming <= 0) q0
    else {
      val masks = array((lit(0L) +:
        (0 until nPlanes).map(i => lit(1L << i))): _*)
      q0.select(col("query_id"), col("__qv"), col("__qn"), col("table"),
        explode(transform(masks, m => col("bucket").bitwiseXOR(m)))
          .as("bucket"))
    }
  }

  /** A persisted-LSH serving handle: the hyper-parameters that
    * determine the (deterministic, seed-42+t) hyperplanes plus the
    * corpus bucket table — (id, table, bucket) rows, the only
    * data-sized piece. Vectors are NOT duplicated into the index;
    * serving joins neighbor ids back to the corpus store. */
  final case class LshIndex(dim: Int, nPlanes: Int, nTables: Int,
                            buckets: DataFrame)

  /** [[lshTopK]] served from a persisted corpus bucket table
    * ([[AnnIndex.saveLsh]]/[[AnnIndex.loadLsh]]): the corpus-side
    * projection pass — nPlanes × nTables dot products per corpus
    * vector, the dominant cost at 100 TB — is paid ONCE at index
    * build; each serve does query-side bucketing (queries ≪ corpus),
    * a bucket join against the stored table, one id-join to fetch
    * candidate vectors, and the bounded top-k tail. Bit-identical to
    * the inline [[lshTopK]] at the same parameters (integer buckets
    * round-trip parquet losslessly; the verify cosine reads the same
    * corpus vectors — spec-pinned). */
  def lshTopKWith(index: LshIndex, queries: DataFrame, corpus: DataFrame,
                  queryIdCol: String, corpusIdCol: String, vecCol: String,
                  k: Int, probeHamming: Int = 1): DataFrame = {
    val q = probedQueryBuckets(queries, queryIdCol, vecCol, index.dim,
      index.nPlanes, index.nTables, probeHamming)
    // join ORDER is the scale decision: the broadcast bucket join runs
    // FIRST, over the stored (id, table, bucket) rows only — 3 small
    // ints per corpus row per table, map-local under the broadcast.
    // The surviving candidate pairs (bucket-pruned, ≪ corpus) then
    // fetch their vectors by id — AQE broadcasts the candidate side,
    // so corpus VECTORS never cross an exchange in either stage.
    // Joining vectors onto the bucket table first would shuffle the
    // whole embedding corpus to serve any query batch.
    val candidates = index.buckets
      .select(col("id").as("neighbor_id"), col("table"), col("bucket"))
      .join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"),
        col("__qn"))
      .distinct()
    val cv = corpus
      .select(col(corpusIdCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
    val scored = candidates.join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (safeDiv(dot(col("__qv"), col("__cv")), col("__qn") * col("__cn"))).as("cos"))
    topKPerQuery(scored, k)
  }

  /** The corpus bucket table a [[LshIndex]] persists — (id, table,
    * bucket); shared with [[AnnIndex.saveLsh]]. */
  private[ops] def lshCorpusBuckets(corpus: DataFrame,
                                    corpusIdCol: String, vecCol: String,
                                    dim: Int, nPlanes: Int,
                                    nTables: Int): DataFrame =
    lshBucketed(corpus, corpusIdCol, vecCol, "id", "__cv", "__cn",
      dim, nPlanes, nTables)
      .select(col("id"), col("table"), col("bucket"))

  /** Lloyd's k-means in EXACT scaled-integer arithmetic — deterministic
    * to the bit on any engine, so (unusually for clustering) the full
    * iterated result is SQL-oracle-checkable by hash.
    *
    * Vectors quantize once to 1e-6 units (`floor(x·1e6 + 0.5)` as
    * BIGINT); squared distances are then exact integer sums
    * (associative — partition order cannot change them, unlike double
    * accumulation); centroid updates are `floor(sum/count)` with one
    * double division (the identical IEEE op everywhere, sums < 2⁵³).
    * Seeds: the `k` smallest `idCol` vectors, cluster index = seed
    * order — fully specified, no RNG. Ties in assignment break on the
    * lower cluster index.
    *
    * Scale shape per iteration: assignment is a BROADCAST cross join
    * (k·dim longs ≈ KBs) + a map-side fused fold — no shuffle of the
    * corpus; the centroid update shuffles (cluster, pos) partial sums
    * — k·dim rows per partition. Centroids localCheckpoint each round
    * (k rows) so the plan stays one-iteration deep instead of
    * replaying the corpus scan per round — the bounded-iteration
    * barrier pattern ([[Dedup]] connected components). The quantized
    * grid (1e-6 of a unit-ish embedding coordinate) is ~5 orders
    * below cluster geometry; it buys exactness, not speed.
    *
    * Output: (idCol, cluster int, d2 bigint — squared distance in
    * 1e-12 units to the final centroid). */
  /** 10^6-scaled integer quantization of the vector column — the
    * shared representation of the exact-deterministic clustering
    * family. */
  private def quantized(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      transform(col(vecCol).cast("array<double>"),
        x => floor(x * lit(1000000.0d) + lit(0.5d)).cast("long")).as("__vq"))

  /** Nearest-centroid assignment of quantized rows: broadcast
    * centroids, associative integer distances, (d2, cluster) min
    * tiebreak. */
  private def assignQuantized(base: DataFrame, cent: DataFrame): DataFrame =
    base.crossJoin(broadcast(cent))
      .withColumn("__d2", aggregate(
        zip_with(col("__vq"), col("__cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .groupBy(col("__id"), col("__vq"))
      .agg(min(struct(col("__d2"), col("cluster"))).as("__best"))
      .select(col("__id"), col("__vq"),
        col("__best.cluster").as("cluster"), col("__best.__d2").as("d2"))

  /** Lloyd k-means centroid FIT in exact scaled-integer arithmetic:
    * returns the trained codebook (cluster, __cv quantized vector) —
    * deterministic to the bit (first-k-by-id seeds, integer distances,
    * floor-division means), the property [[kmeansAssign]] and the PQ
    * family build on. Centroids localCheckpoint per round (the
    * bounded-iteration barrier). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iterations: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val base = quantized(df, idCol, vecCol)
    val seedW = Window.orderBy(col("__id")) // k rows — single partition is fine
    var centroids = base.orderBy(col("__id")).limit(k)
      .select((row_number().over(seedW) - 1).cast("int").as("cluster"),
        col("__vq").as("__cv"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val assigned = assignQuantized(base, centroids)
      centroids = assigned
        .select(col("cluster"), posexplode(col("__vq")).as(Seq("__pos", "__v")))
        .groupBy(col("cluster"), col("__pos"))
        .agg(floor(sum(col("__v")).cast("double") / count(lit(1)))
          .cast("long").as("__c"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__c")))),
          s => s.getField("__c")).as("__cv"))
        .localCheckpoint()
    }
    centroids
  }

  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iterations: Int): DataFrame =
    assignQuantized(quantized(df, idCol, vecCol),
        kmeansFit(df, idCol, vecCol, k, iterations))
      .select(col("__id").as(idCol), col("cluster"), col("d2"))

  /** SemDeDup-style semantic near-duplicate pairs: cluster the corpus
    * with the exact-deterministic [[kmeansAssign]], then score cosine
    * ONLY within clusters — pairs (id_a < id_b, cluster, cos) with
    * cos ≥ threshold.
    *
    * The scale contract (per the SemDeDup recipe): the all-pairs
    * product shrinks to Σ_c |c|² via the cluster-keyed self-join —
    * k trades recall for fanout (a near-dup pair straddling a cluster
    * boundary is missed; duplicates at these thresholds are near-
    * coincident and almost always co-cluster — the documented
    * trade). Deterministic end to end: integer k-means + fixed-order
    * double cosines, so the full pipeline is SQL-oracle-checkable —
    * unlike the sign-LSH path ([[lshNearDupPairs]]), whose bucket
    * structure has no tractable SQL twin.
    */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iterations: Int,
                           threshold: Double): DataFrame = {
    val assigned = kmeansAssign(df, idCol, vecCol, k, iterations)
      .select(col(idCol).as("__aid"), col("cluster"))
    val vecs = df.select(col(idCol).as("__aid"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
    val members = assigned.join(vecs, "__aid")
    val a = members.select(col("cluster"), col("__aid").as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = members.select(col("cluster"), col("__aid").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        safeDiv(dot(col("__va"), col("__vb")), col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cluster"),
        round(col("cos"), 6).as("cos"))
  }

  /** Product-quantization ENCODE: split each D-dim vector into `m`
    * equal subspaces, Lloyd-fit a k-centroid codebook per subspace
    * ([[kmeansFit]] — exact scaled-integer, bit-deterministic), and
    * store each vector as m small codes plus its total reconstruction
    * error. The memory story of billion-scale ANN: m·log2(k) bits per
    * vector instead of 4·D bytes (m=8,k=256 ⇒ 8 bytes for a 64-dim
    * float vector, 32×).
    *
    * Determinism makes the WHOLE training+encode pipeline
    * SQL-oracle-checkable — the same property `q_kmeans` pins, per
    * subspace. Scale shape: ONE batched Lloyd loop fits all m
    * codebooks ([[pqFitCodebooks]] — 2 jobs per iteration, not 2m),
    * then m all-broadcast assignments (the corpus never shuffles for
    * assignment) joined id-keyed; at 100 TB you fit codebooks on a
    * hash-sample ([[Sampling.sampleByHash]]) and this encode pass is
    * unchanged. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               m: Int, k: Int, iterations: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val dim = df.select(size(col(vecCol)).cast("int").as("d")).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val sub = dim / m
    // codebooks batched into one Lloyd loop (bit-identical to
    // per-subspace kmeansFit — OpsSpec-pinned); assignment stays per
    // subspace, each a broadcast join of its tiny codebook
    val codebooks = pqFitCodebooks(df, idCol, vecCol, m, k, iterations)
    val parts = (0 until m).map { s =>
      assignQuantized(
          quantized(df.select(col(idCol),
            slice(col(vecCol), s * sub + 1, sub).as("__sv")),
            idCol, "__sv"), codebooks(s))
        .select(col("__id").as(idCol), col("cluster").as(s"code_$s"),
          col("d2").as(s"__d2_$s"))
    }
    parts.reduce((a, b) => a.join(b, Seq(idCol)))
      .withColumn("recon_d2",
        (0 until m).map(s => col(s"__d2_$s")).reduce(_ + _))
      .select(col(idCol) +:
        (0 until m).map(s => col(s"code_$s")) :+ col("recon_d2"): _*)
  }

  /** Asymmetric-distance (ADC) top-k search over PQ codes: queries
    * never touch raw corpus vectors — each query precomputes an m×k
    * integer distance table to the codebooks, and a corpus row's
    * distance is m table lookups summed (exact squared L2 between the
    * quantized query and the row's RECONSTRUCTION, since squared L2
    * decomposes over disjoint subspaces — spec-pinned equality).
    *
    * Scale shape: codebooks and distance tables (|queries|·m·k rows)
    * broadcast; the corpus streams map-side through m broadcast-hash
    * lookups; the only shuffle is the bounded per-query top-k
    * aggregate (≤ topK rows per query per partition). Pair with the
    * IVF cell prune ([[ivfPqSearch]]) when even one streaming pass is
    * too much. */
  def pqSearch(corpus: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, queryIdCol: String,
               m: Int, k: Int, iterations: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    adcTopK(adcScored(corpus, idCol, vecCol, queries, queryIdCol,
      m, k, iterations, seed = None), topK)
  }

  /** The per-subspace PQ core shared by [[pqSearch]] and
    * [[ivfPqSearch]]: m codebook fits + corpus encodes + broadcast
    * per-query full distance tables, chained into (query_id,
    * neighbor_id, adc_d2) rows. `seed = Some(pairs)` restricts scoring
    * to the given (query_id, __cid) candidate pairs (the IVF prune);
    * None scores every corpus row per query code-match (the streaming
    * full-scan form). */
  private def adcScored(corpus: DataFrame, idCol: String, vecCol: String,
                        queries: DataFrame, queryIdCol: String,
                        m: Int, k: Int, iterations: Int,
                        seed: Option[DataFrame]): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    adcScoredWith(corpus, idCol, vecCol, queries, queryIdCol,
      pqFitCodebooks(corpus, idCol, vecCol, m, k, iterations), dim, seed)
  }

  private def vecDim(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol)).cast("int").as("d"))
      .take(1).headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "PQ search requires a non-empty corpus"))

  /** Subspace `s`'s FULL per-centroid query distance table (not a
    * nearest-only assignment): every centroid's d2 via the broadcast
    * cross. ONE definition shared by [[adcScoredWith]] (re-encoding
    * serve) and [[ivfPqSearchCoded]] (stored-codes serve) so the two
    * paths cannot drift. */
  private def queryDistanceTable(queries: DataFrame, queryIdCol: String,
                                 cb: DataFrame, s: Int,
                                 vecCol: String, sub: Int): DataFrame =
    quantized(
        queries.select(col(queryIdCol),
          slice(col(vecCol), s * sub + 1, sub).as("__sv")),
        queryIdCol, "__sv")
      .crossJoin(broadcast(cb))
      .withColumn(s"__qd2_$s", aggregate(
        zip_with(col("__vq"), col("__cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .select(col("__id").as("query_id"),
        col("cluster").as(s"__code_$s"), col(s"__qd2_$s"))

  /** [[adcScored]] with PRE-TRAINED codebooks — the serving path of a
    * persisted index ([[IvfPqIndex]]): encode + distance tables only,
    * no fits. */
  private def adcScoredWith(corpus: DataFrame, idCol: String,
                            vecCol: String, queries: DataFrame,
                            queryIdCol: String,
                            codebooks: Seq[DataFrame], dim: Int,
                            seed: Option[DataFrame]): DataFrame = {
    val m = codebooks.size
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val sub = dim / m
    var scored: DataFrame = seed.orNull
    for (s <- 0 until m) {
      val slc = slice(col(vecCol), s * sub + 1, sub)
      val cb = codebooks(s)
      val enc = assignQuantized(
          quantized(corpus.select(col(idCol), slc.as("__sv")),
            idCol, "__sv"), cb)
        .select(col("__id").as("__cid"), col("cluster").as(s"__code_$s"))
      val dtAll = queryDistanceTable(queries, queryIdCol, cb, s,
        vecCol, sub)
      scored =
        if (scored == null)
          enc.join(broadcast(dtAll), Seq(s"__code_$s"))
        else
          scored.join(enc.select(col("__cid"), col(s"__code_$s")),
              Seq("__cid"))
            .join(broadcast(dtAll), Seq("query_id", s"__code_$s"))
    }
    scored
      .withColumn("adc_d2",
        (0 until m).map(s => col(s"__qd2_$s")).reduce(_ + _))
      .select(col("query_id"), col("__cid").as("neighbor_id"),
        col("adc_d2"))
  }

  /** Bounded per-query ADC top-k tail shared by [[pqSearch]] and
    * [[ivfPqSearch]]: ≤ topK rows per query per partition cross the
    * shuffle. */
  private def adcTopK(total: DataFrame, topK: Int): DataFrame =
    total
      .groupBy(col("query_id"))
      .agg(graft.functions.BoundedTopKAgg.minK(
        struct(col("adc_d2").as("d"), col("neighbor_id").as("id")), topK)
        .as("__nn"))
      .select(col("query_id"),
        posexplode(col("__nn")).as(Seq("__pos", "__s")))
      .select(col("query_id"), col("__s.id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__s.d").as("adc_d2"))

  /** A trained IVF-PQ index: the driver-resident IVF centroids (raw
    * doubles, k×dim) plus the m per-subspace PQ codebooks (each a
    * LOCAL (cluster, __cv) relation of quantized integer vectors —
    * driver-materialized, so the index survives executor loss and
    * pins no executor storage across its lifetime). Train ONCE
    * ([[ivfPqFit]]), persist ([[AnnIndex.save]]), serve many query
    * batches ([[ivfPqSearchWith]]) — production ANN never retrains
    * per query; the index is the asset. */
  final case class IvfPqIndex(centroids: Seq[Seq[Double]],
                              codebooks: Seq[DataFrame], dim: Int)

  /** Train the IVF-PQ index (no search): one spherical-IVF train pass
    * plus the m per-subspace codebook fits BATCHED into a single Lloyd
    * loop ([[pqFitCodebooks]] — 2 jobs per iteration instead of 2m; at
    * 1000 executors driver round-trips are the serial cost, and the m
    * fits are data-parallel over the same rows anyway).
    * `trainSampleMod > 1` trains BOTH on the same deterministic
    * hash-slice of the corpus — at 100 TB codebooks fit on a sample
    * (standard PQ practice; the codebook only has to quantize the
    * space, not see every vector) and serving encodes the full corpus
    * unchanged. Falls back to the full corpus when the slice is
    * smaller than pqK. The codebook frames are driver-resident local
    * relations — the fit-once/serve-many contract must not hinge on
    * executor-resident checkpoint blocks. */
  def ivfPqFit(corpus: DataFrame, corpusIdCol: String, vecCol: String,
               nCentroids: Int = 16, ivfIterations: Int = 2,
               trainSampleMod: Int = 1, m: Int = 4, pqK: Int = 16,
               pqIterations: Int = 2): IvfPqIndex = {
    val dim = vecDim(corpus, vecCol)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val centroids = ivfTrain(corpus, vecCol, nCentroids, ivfIterations,
      trainSampleMod)
    val train = {
      if (trainSampleMod <= 1) corpus
      else {
        val sampled = corpus.filter(pmod(
          xxhash64(col(vecCol).cast("array<double>")),
          lit(trainSampleMod.toLong)) === 0)
        if (sampled.limit(pqK).count() < pqK) corpus else sampled
      }
    }
    IvfPqIndex(centroids,
      pqFitCodebooks(train, corpusIdCol, vecCol, m, pqK, pqIterations),
      dim)
  }

  /** All m subspace codebooks in ONE Lloyd loop — bit-identical to m
    * independent [[kmeansFit]] calls over the vector's m slices
    * (same first-k-by-id seeds per subspace, same exact-integer
    * distances and floor-division means, same vanishing-empty-cluster
    * behavior; equality pinned in OpsSpec) but each iteration is 2
    * Spark jobs instead of 2m: the subspace id rides as a grouping
    * column through the same assignment join and update aggregate.
    * Returns one driver-resident local relation per subspace,
    * (cluster, __cv) — [[kmeansFit]]'s output contract. */
  private[ops] def pqFitCodebooks(train: DataFrame, idCol: String,
                                  vecCol: String, m: Int, k: Int,
                                  iterations: Int): Seq[DataFrame] = {
    val dim = vecDim(train, vecCol)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m")
    val sub = dim / m
    val spark = train.sparkSession
    // quantize the FULL vector once, slice per subspace (elementwise
    // quantization commutes with slicing)
    val vq = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1000000.0d) + lit(0.5d)).cast("long"))
    val base = train
      .select(col(idCol).as("__id"), vq.as("__vqf"))
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("__vqf"), s * lit(sub) + lit(1), lit(sub))))
        .as(Seq("subspace", "__vq")))
      .localCheckpoint(true) // seeds + every Lloyd pass re-scan it
    val seedW = Window.partitionBy(col("subspace")).orderBy(col("__id"))
    var centroids = base
      .withColumn("__rn", row_number().over(seedW))
      .filter(col("__rn") <= k)
      .select(col("subspace"),
        (col("__rn") - 1).cast("int").as("cluster"),
        col("__vq").as("__cv"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val assigned = base.join(broadcast(centroids), Seq("subspace"))
        .withColumn("__d2", aggregate(
          zip_with(col("__vq"), col("__cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .groupBy(col("subspace"), col("__id"), col("__vq"))
        .agg(min(struct(col("__d2"), col("cluster"))).as("__best"))
        .select(col("subspace"), col("__vq"),
          col("__best.cluster").as("cluster"))
      centroids = assigned
        .select(col("subspace"), col("cluster"),
          posexplode(col("__vq")).as(Seq("__pos", "__v")))
        .groupBy(col("subspace"), col("cluster"), col("__pos"))
        .agg(floor(sum(col("__v")).cast("double") / count(lit(1)))
          .cast("long").as("__c"))
        .groupBy(col("subspace"), col("cluster"))
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__c")))),
          s => s.getField("__c")).as("__cv"))
        .localCheckpoint()
    }
    val rows = centroids.collect() // m×k rows
    val cbSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cluster",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false))))
    (0 until m).map { s =>
      val rs = rows.filter(_.getInt(0) == s).map(r =>
        org.apache.spark.sql.Row(r.getInt(1), r.getSeq[Long](2)))
      spark.createDataFrame(
        java.util.Arrays.asList(rs.toIndexedSeq: _*), cbSchema)
    }
  }

  /** Serve one query batch against a trained/loaded [[IvfPqIndex]]:
    * cell-candidate generation + code encode + ADC — NO training
    * work. Bit-identical to the search [[ivfPqSearch]] runs right
    * after its own fit (spec-pinned through an [[AnnIndex]]
    * save/load round-trip). */
  def ivfPqSearchWith(index: IvfPqIndex, queries: DataFrame,
                      corpus: DataFrame, queryIdCol: String,
                      corpusIdCol: String, vecCol: String, topK: Int,
                      nProbe: Int = 4, corpusSpill: Int = 1): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // an index trained on a different embedding width would score
    // truncated/null-padded subvectors SILENTLY — refuse loudly (the
    // embedding-model-changed-between-fit-and-serve mistake)
    val serveDim = vecDim(corpus, vecCol)
    require(serveDim == index.dim,
      s"index dim ${index.dim} != serving corpus dim $serveDim — " +
        "refit or load the matching index")
    val c = cellExplode(corpus, corpusIdCol, "__cid", vecCol,
      index.centroids, corpusSpill)
    val q = cellExplode(queries, queryIdCol, "query_id", vecCol,
      index.centroids, nProbe)
    // checkpointed: the seed frame feeds the m-subspace join chain and
    // would otherwise re-run the cell join per downstream action
    val candidates = c.join(broadcast(q), Seq("cell"))
      .filter(col("__cid") =!= col("query_id"))
      .select(col("query_id"), col("__cid")).distinct()
      .localCheckpoint(true)
    adcTopK(adcScoredWith(corpus, corpusIdCol, vecCol, queries,
      queryIdCol, index.codebooks, index.dim, seed = Some(candidates)),
      topK)
  }

  /** Encode the corpus ONCE under a trained [[IvfPqIndex]]: one row
    * per (vector, spilled IVF cell) carrying the m PQ codes —
    * (`__cid`, `cell`, `__code_0..m-1`). This frame IS the serving
    * half of a real IVFADC deployment: [[ivfPqSearchWith]] re-derives
    * it from raw vectors on EVERY call (m broadcast-assign passes over
    * the whole corpus per query batch — fine for one-shot search,
    * wrong for serve-many), while [[ivfPqSearchCoded]] reads it as
    * stored small ints and never touches a raw corpus vector at all.
    * Persist alongside the index ([[AnnIndex.save]]'s `corpusCodes`)
    * so codes and codebooks are one generation by construction —
    * codes scored against a different generation's codebooks would be
    * silently wrong distances. */
  def ivfPqEncodeCorpus(index: IvfPqIndex, corpus: DataFrame,
                        corpusIdCol: String, vecCol: String,
                        corpusSpill: Int = 1): DataFrame = {
    val serveDim = vecDim(corpus, vecCol)
    require(serveDim == index.dim,
      s"index dim ${index.dim} != corpus dim $serveDim — refit or " +
        "load the matching index")
    val m = index.codebooks.size
    val sub = index.dim / m
    val cells = cellExplode(corpus, corpusIdCol, "__cid", vecCol,
      index.centroids, corpusSpill)
    val codes = (0 until m).map { s =>
      assignQuantized(
          quantized(corpus.select(col(corpusIdCol),
            slice(col(vecCol), s * sub + 1, sub).as("__sv")),
            corpusIdCol, "__sv"), index.codebooks(s))
        .select(col("__id").as("__cid"), col("cluster").as(s"__code_$s"))
    }.reduce((a, b) => a.join(b, Seq("__cid")))
    cells.join(codes, Seq("__cid"))
  }

  /** Serve a query batch from STORED corpus codes — no raw corpus
    * vectors anywhere in the plan: candidates come from the coded
    * frame's cell column joined against the broadcast probed query
    * cells, scoring is m broadcast distance-table lookups on the
    * stored codes, the tail is the bounded top-k aggregate.
    * Bit-identical to [[ivfPqSearchWith]] over the same index +
    * corpus (the codes are the same deterministic integer
    * assignments — spec-pinned). At 100 TB this is the difference
    * between reading m·|corpus| small ints and re-encoding
    * dim·|corpus| floats per query batch. */
  def ivfPqSearchCoded(index: IvfPqIndex, codes: DataFrame,
                       queries: DataFrame, queryIdCol: String,
                       vecCol: String, topK: Int,
                       nProbe: Int = 4): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val qDim = vecDim(queries, vecCol)
    require(qDim == index.dim,
      s"index dim ${index.dim} != query dim $qDim — refit or load " +
        "the matching index")
    val m = index.codebooks.size
    val sub = index.dim / m
    val q = cellExplode(queries, queryIdCol, "query_id", vecCol,
      index.centroids, nProbe)
    var scored = codes.join(broadcast(q), Seq("cell"))
      .filter(col("__cid") =!= col("query_id"))
      .select(col("query_id") +: col("__cid") +:
        (0 until m).map(s => col(s"__code_$s")): _*)
      .distinct()
    for (s <- 0 until m)
      scored = scored.join(
        broadcast(queryDistanceTable(queries, queryIdCol,
          index.codebooks(s), s, vecCol, sub)),
        Seq("query_id", s"__code_$s"))
    adcTopK(
      scored.withColumn("adc_d2",
          (0 until m).map(s => col(s"__qd2_$s")).reduce(_ + _))
        .select(col("query_id"), col("__cid").as("neighbor_id"),
          col("adc_d2")),
      topK)
  }

  /** IVF-PQ ANN search — the two sublinear pieces composed, the
    * standard billion-scale index shape (an IVFADC): IVF cells prune
    * WHICH corpus rows are scored (candidate work follows the
    * `nProbe` probed cells, not the corpus), PQ ADC prunes WHAT each
    * score costs (m broadcast-table lookups on integer codes instead
    * of a dim-length float dot against a raw vector the executor
    * would have to hold). Fit + serve in one call — a repeated-serving
    * caller should [[ivfPqFit]] once and [[ivfPqSearchWith]] per
    * batch (persisting via [[AnnIndex]]).
    *
    * Scale shape: candidate generation is the [[ivfTopK]] cell join
    * (query side broadcast — queries ≪ corpus); the PQ stage joins
    * candidates to the corpus CODES (m small ints per row — raw
    * vectors never reach the scoring join) and to broadcast per-query
    * distance tables; the only unbounded-side shuffle is candidates,
    * already cell-pruned; the tail is the bounded top-k aggregate. At
    * 100 TB the coded corpus is ~dim×4/m× smaller than the raw one —
    * the memory-resident-index property that makes IVFADC the
    * billion-vector default.
    *
    * Quality pin (`OpsSpec`): a query that IS a corpus vector finds
    * its copy at ADC distance == the copy's reconstruction distance —
    * the copy ranks in the top-k for ≥ 90% of planted queries at the
    * declared parameters (ties with same-cell coarse codes are the
    * only miss mode). */
  def ivfPqSearch(queries: DataFrame, corpus: DataFrame,
                  queryIdCol: String, corpusIdCol: String, vecCol: String,
                  topK: Int, nCentroids: Int = 16, nProbe: Int = 4,
                  ivfIterations: Int = 2, trainSampleMod: Int = 1,
                  corpusSpill: Int = 1, m: Int = 4, pqK: Int = 16,
                  pqIterations: Int = 2): DataFrame =
    ivfPqSearchWith(
      ivfPqFit(corpus, corpusIdCol, vecCol, nCentroids, ivfIterations,
        trainSampleMod, m, pqK, pqIterations),
      queries, corpus, queryIdCol, corpusIdCol, vecCol, topK, nProbe,
      corpusSpill)

  /** (outId, cell) rows: each vector exploded to its `n` nearest IVF
    * cells (n = 1 collapses to the single nearest). Shared by
    * [[ivfPqSearch]]'s corpus (spill) and query (probe) sides. */
  private def cellExplode(df: DataFrame, idCol: String, outId: String,
                          vecCol: String, centroids: Seq[Seq[Double]],
                          n: Int): DataFrame = {
    val raw = col(vecCol).cast("array<double>")
    df.select(col(idCol).as(outId), raw.as("__v"))
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
      .select(col(outId),
        (if (n <= 1) nearestCell(unit(col("__v"), col("__n")), centroids)
         else explode(nearestCells(unit(col("__v"), col("__n")),
           centroids, n))).as("cell"))
  }
}
