package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering (the
  * PPJoin/AllPairs family): all document pairs whose token-set Jaccard
  * meets a threshold — EXACT results (unlike the MinHash/SimHash
  * paths, which trade recall), without the all-pairs product (unlike
  * the brute-force verify).
  *
  * The filter that makes it scale: order every document's tokens by
  * ascending document frequency (rarest first — one global order), and
  * only the first ℓ_d = |d| − ⌈t·|d|⌉ + 1 tokens of each document
  * generate candidates. Any pair with Jaccard ≥ t provably shares a
  * prefix token under a common total order, so the filter is LOSSLESS;
  * because prefixes hold each document's RAREST tokens, per-token
  * candidate fanout is the smallest any blocking scheme can buy
  * without losing exactness. A length filter (t·|b| ≤ |a|) prunes the
  * rest.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with token-set Jaccard ≥ `threshold` over
    * whitespace-tokenized `textCol`. Output: (id_a, id_b, common,
    * size_a, size_b, jac) with jac rounded at 6 (filtered unrounded).
    *
    * Scale shape: token-keyed shuffles only, no product —
    * (1) df counts (partial-agg groupBy term), (2) the per-doc rank
    * window on (df, term), (3) the prefix self-join on term, pruned
    * PER MATCH by PPJoin's positional upper bound (a match at prefix
    * positions p_a/p_b can witness at most 1 + min(|a|−p_a, |b|−p_b)
    * common tokens — pairs that cannot reach the equivalent-overlap
    * threshold α = ⌈t/(1+t)·(|a|+|b|)⌉ die before the candidate
    * aggregate), then (4) verification joins each surviving pair to
    * its two sorted token ARRAYS and intersects them in one codegen'd
    * expression — candidate-keyed, O(|a|+|b|) per pair, never the
    * candidates×tokens row expansion. Skewed common terms never enter
    * prefixes (they sort last by df); AQE skew-join covers the rest. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double, shingle: Int = 1): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1], got $threshold")
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    // set elements: single tokens, or (for a low-vocabulary corpus,
    // where every doc shares most tokens and NO exact filter can
    // prune) w-token shingles — the df distribution sharpens and the
    // metric becomes sequence-sensitive, which is what near-dup
    // detection wants anyway
    val tokArr = split(trim(lower(col(textCol))), "\\s+")
    val elems =
      if (shingle <= 1) tokArr
      else when(size(tokArr) >= shingle,
          transform(sequence(lit(0), size(tokArr) - shingle),
            i => concat_ws(" ", slice(tokArr, i + 1, lit(shingle)))))
        .otherwise(array().cast("array<string>"))
    // Two measured hot-path choices (4× together at sf0.1):
    //  - shingle strings hash to 64-bit keys IMMEDIATELY, and the SET
    //    semantics come from a relational distinct on (id, hash) —
    //    per-row array_distinct over ~300 strings was the single most
    //    expensive expression in the plan, and wide strings never
    //    cross a shuffle this way. A 64-bit collision (P ≈ n²/2⁶⁵)
    //    could conflate two shingles — the same documented trade as
    //    Dedup.duplicateSpans. Df-ordering over (df, hash): ANY
    //    consistent total order keeps the prefix filter lossless.
    //  - the deduplicated token set localCheckpoints: FOUR downstream
    //    consumers (df counts, rank probe, prefix sides, verify
    //    arrays) would each replay the tokenize+explode lineage —
    //    the dominant cost. Same barrier discipline as
    //    Indexing.globalIndex; ~16 bytes/shingle instance.
    val toks = df
      .select(col(idCol).as("__id"), explode(elems).as("__t"))
      .filter(col("__t") =!= "")
      .select(col("__id"), xxhash64(col("__t")).as("__term"))
      .distinct()
      .localCheckpoint()
    val dfc = toks.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__df"), col("__term"))
    val ranked = toks.join(dfc, "__term")
      .withColumn("__pos", row_number().over(w))
      .withColumn("__size",
        count(lit(1)).over(Window.partitionBy(col("__id"))))
    // ⌈x⌉ with a 1e-9 downward nudge: double rounding may land x a few
    // ulps ABOVE an exact integer, and ceil of that would shorten the
    // prefix / raise a bound — the nudge errs toward MORE candidates,
    // never a lost pair
    def ceilSafe(c: Column): Column = ceil(c - lit(1e-9)).cast("long")
    val prefixLen = col("__size") -
      ceilSafe(col("__size") * lit(threshold)) + 1
    val prefix = ranked.filter(col("__pos") <= prefixLen)
      .select(col("__id"), col("__term"), col("__pos"), col("__size"))
    val cands = prefix.select(col("__id").as("id_a"), col("__term"),
        col("__pos").as("__pa"), col("__size").as("size_a"))
      .join(prefix.select(col("__id").as("id_b"), col("__term"),
        col("__pos").as("__pb"), col("__size").as("size_b")), Seq("__term"))
      .filter(col("id_a") < col("id_b") &&
        col("size_a") >= ceilSafe(col("size_b") * lit(threshold)) &&
        col("size_b") >= ceilSafe(col("size_a") * lit(threshold)) &&
        // positional upper bound vs the overlap equivalent of Jaccard t
        (lit(1) + least(col("size_a") - col("__pa"),
          col("size_b") - col("__pb"))) >=
          ceilSafe((col("size_a") + col("size_b")) *
            lit(threshold / (1.0 + threshold))))
      .select(col("id_a"), col("id_b"), col("size_a"), col("size_b"))
      .distinct()
    // arrays for the verify step come from `ranked`, not a fresh pass
    // over `toks`: the rank window already hash-partitioned rows by
    // doc, so this groupBy reuses that exchange instead of re-deriving
    // (re-explode + re-shuffle) the token set a third time
    val arrays = ranked.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__term"))).as("__terms"))
    val common = cands
      .join(arrays.select(col("__id").as("id_a"),
        col("__terms").as("__ta")), Seq("id_a"))
      .join(arrays.select(col("__id").as("id_b"),
        col("__terms").as("__tb")), Seq("id_b"))
      .withColumn("common",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .drop("__ta", "__tb")
    common
      .withColumn("__jac", col("common").cast("double") /
        (col("size_a") + col("size_b") - col("common")))
      .filter(col("__jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"),
        col("size_a"), col("size_b"), round(col("__jac"), 6).as("jac"))
  }
}
