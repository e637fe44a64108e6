package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset splits.
  *
  * `df.sample()` seeds Spark's own RNG — results change with
  * partitioning and are irreproducible outside Spark. Training
  * pipelines need the opposite: a row's split membership must be a pure
  * function of its key, stable across engines, runs, and repartitions
  * (so a holdout set never leaks into training when the pipeline is
  * re-run or the data is re-laid-out). Knuth's multiplicative hash over
  * the key gives uniform buckets in plain integer arithmetic any engine
  * reproduces exactly. All map-only — no shuffle, no state.
  */
object Sampling {

  /** Knuth's 32-bit multiplicative constant (2^32 / φ). */
  val HashA = 2654435761L
  val M31 = 2147483648L  // 2^31 — pre-multiply key fold
  private val M32 = 4294967296L // 2^32

  /** Uniform bucket in [0, buckets) as a pure function of an integer
    * key: ((key mod 2³¹)·A mod 2³²) mod buckets. The key is folded to
    * 31 bits BEFORE the multiply so the product stays under 2^63 for
    * any long key — without the fold, |key| > 2^63/A ≈ 3.4e9 silently
    * wraps in Spark and raises a BIGINT overflow in other engines,
    * breaking the cross-engine membership guarantee this module exists
    * for. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(pmod(key.cast("long"), lit(M31)) * lit(HashA), lit(M32)),
      lit(buckets.toLong))

  /** The [[hashBucket]] input for a user key column: numeric keys
    * feed the affine hash directly (the engine-portable path). STRING
    * keys — URLs, content hashes, the crawl-curation id shape — would
    * `cast("long")` to null and silently collapse every row into one
    * bucket (a split that degenerates to all-"test" without error),
    * so they hash through xxhash64 first: deterministic across runs,
    * partitionings and re-layouts within Spark; the cross-ENGINE
    * membership guarantee needs numeric keys (documented trade). Any
    * other key type refuses loudly instead of cast-to-null
    * degenerating. */
  private def keyForBucket(df: DataFrame, keyCol: String): Column = {
    import org.apache.spark.sql.types.{NumericType, StringType,
      TimestampType}
    df.select(col(keyCol)).schema.head.dataType match {
      case _: NumericType => col(keyCol)
      // epoch seconds — the same value every engine derives, so the
      // cross-engine guarantee holds for timestamp keys too
      case TimestampType => col(keyCol).cast("long")
      case StringType => xxhash64(col(keyCol))
      case dt => throw new IllegalArgumentException(
        s"split/sample key '$keyCol' has type ${dt.simpleString}: use " +
          "a numeric or timestamp key (engine-portable membership) or " +
          "a string key (xxhash64 path, Spark-deterministic)")
    }
  }

  /** Keep a deterministic pct% sample by key — the train/holdout split.
    * Complementary selections (pct and 100-pct via >=) partition the
    * data exactly. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.filter(hashBucket(keyForBucket(df, keyCol), 100) < pct)
  }

  /** Domain-mixture sampling: per-domain keep percentages — the data
    * recipe step of a pre-training pipeline (upsample curated sources,
    * downsample bulk crawl to hit target proportions). Membership is
    * the same pure hash-of-key function as [[sampleByHash]], so the
    * mixture is reproducible across engines and re-runs, and rates are
    * per-domain CASE branches — map-only, no shuffle, no driver state.
    * Domains absent from `pctByDomain` keep `defaultPct`%. */
  def mixtureSample(df: DataFrame, domainCol: String, keyCol: String,
                    pctByDomain: Map[String, Int],
                    defaultPct: Int = 0): DataFrame = {
    (pctByDomain.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be 0..100, got $p"))
    // sorted fold: a deterministic branch order keeps the plan (and its
    // canonicalized cache key) stable across Map iteration orders
    val rate = pctByDomain.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (dom, pct)) =>
        when(col(domainCol) === lit(dom), lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(keyForBucket(df, keyCol), 100) < rate)
  }

  /** Weighted mixture with UPSAMPLING: each domain's rows are emitted
    * `factor`× on average, where factor is a per-mille integer (2500 =
    * 2.5×) — the data-recipe step when curated sources must be seen
    * more than once per epoch. Each row yields floor(factor) full
    * copies plus one more iff its hash fraction falls under the
    * fractional part, so expected counts are exact per domain and
    * membership of the extra copy is the same pure hash-of-key
    * function as [[sampleByHash]] (reproducible across engines and
    * re-runs; factors < 1000 degrade to plain downsampling). Emits
    * `copy_idx` (1-based) so downstream ops can tell copies apart.
    *
    * Scale shape: a CASE factor + `explode(sequence)` — map-side only,
    * no shuffle, no driver state; at 100 TB the blow-up happens after
    * the scan, sized exactly by the factors, never through an
    * exchange. */
  def upsampleMixture(df: DataFrame, domainCol: String, keyCol: String,
                      perMilleByDomain: Map[String, Int],
                      defaultPerMille: Int = 1000): DataFrame = {
    (perMilleByDomain.values.toSeq :+ defaultPerMille).foreach(f =>
      require(f >= 0, s"factor must be >= 0 per-mille, got $f"))
    require(!df.columns.contains("copy_idx"),
      "input already has a copy_idx column")
    val perMille = perMilleByDomain.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (dom, f)) =>
        when(col(domainCol) === lit(dom), lit(f)).otherwise(acc)
      }
    val copies = (perMille / lit(1000)).cast("int") +
      when(hashBucket(keyForBucket(df, keyCol), 1000) < perMille % lit(1000), lit(1))
        .otherwise(lit(0))
    // sequence(1, 0) counts DOWN ([1, 0]) rather than yielding an empty
    // array — guard the zero-copy case explicitly
    df.withColumn("copy_idx",
        explode(when(copies >= lit(1),
            sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
  }

  /** Stratified sample: per stratum, keep ceil(frac·|stratum|) rows,
    * chosen by hash rank (deterministic; ties broken by key). One
    * shuffle on the stratum column; rank and stratum size share the
    * same window partitioning, so it's a single exchange. */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 fracPct: Int): DataFrame = {
    require(fracPct >= 0 && fracPct <= 100,
      s"fracPct must be 0..100, got $fracPct")
    val scratch = Seq("__graft_rank", "__graft_n")
    val clash = df.columns.toSeq.intersect(scratch)
    require(clash.isEmpty, // withColumn would silently REPLACE them
      s"input columns collide with stratified()'s scratch names: " +
        clash.mkString(", "))
    val w = Window.partitionBy(col(stratumCol))
    val rank = row_number().over(
      w.orderBy(hashBucket(keyForBucket(df, keyCol), 1000000), col(keyCol)))
    df.withColumn("__graft_rank", rank)
      .withColumn("__graft_n", count(lit(1)).over(w))
      .filter(col("__graft_rank") <=
        ceil(col("__graft_n") * lit(fracPct) / lit(100.0)))
      .drop(scratch: _*)
  }

  /** Deterministic per-group reservoir: exactly min(k, |distinct
    * non-null keys of the group|) keys per group, chosen by hash rank
    * (the same engine-portable
    * [[hashBucket]] priority as every split in this module, ties
    * broken by key) — "show me k uniform examples from every stratum"
    * without an RNG, stable across runs, engines, and re-layouts.
    * Output: (groupCol, keyCol) rows.
    *
    * Scale shape: one partial-aggregating shuffle carrying AT MOST k
    * values per group per partition — the bounded custom aggregate
    * ([[graft.functions.BoundedTopKAgg]]), not a window: the
    * row_number() form ([[stratified]]'s shape, fine when keeping a
    * FRACTION) would shuffle and sort a billion-row group to keep 5
    * of them. */
  def reservoirPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                        k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    // a null key has no hash priority (null struct field sorts first
    // and would crowd into every group's sample) — not a sample member.
    // distinct first: repeated keys are ONE sample member (the heap
    // would otherwise admit both copies and emit a duplicate row);
    // partial aggregation makes the extra exchange key-grained, cheap
    df.select(col(groupCol), col(keyCol))
      .filter(col(keyCol).isNotNull)
      .distinct()
      .groupBy(col(groupCol))
      .agg(graft.functions.BoundedTopKAgg.minK(
        struct(hashBucket(keyForBucket(df, keyCol), 1000000).as("h"),
          col(keyCol).as("k")), k).as("__kept"))
      .select(col(groupCol), explode(col("__kept.k")).as(keyCol))
  }

  /** Three-way train/val/test assignment as a pure function of the
    * key: bucket < pctTrain → "train", < pctTrain+pctVal → "val", else
    * "test". The canonical dataset-split contract — membership never
    * moves between splits across runs, engines, or re-layouts (the
    * leakage guarantee), and the three selections partition the data
    * exactly. Adds a `split` column; map-only. */
  def datasetSplit(df: DataFrame, keyCol: String,
                   pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"pcts must be >= 0 with train+val <= 100, got $pctTrain/$pctVal")
    val b = hashBucket(keyForBucket(df, keyCol), 100)
    df.withColumn("split",
      when(b < pctTrain, "train")
        .when(b < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents are
    * one ATOMIC unit — a plain per-id split ([[datasetSplit]]) puts
    * two near-identical docs on opposite sides of the train/eval
    * fence, and the eval set silently contains training material (the
    * contamination every dedup stage upstream exists to prevent,
    * reintroduced by the split itself). Pairs (from any detector:
    * [[Dedup.minHashLshPairs]], simhash, semantic) collapse to
    * connected components ([[Dedup.duplicateGroups]]); each doc's
    * split is decided by the engine-portable [[hashBucket]] of its
    * GROUP label (singletons: their own key), so every member of a
    * duplicate cluster lands on the same side — across runs, engines,
    * and re-layouts. Adds `split` and the deciding `split_unit`.
    *
    * Scale shape: the groups frame is bounded by docs-that-have-dups
    * (pair-derived, typically ≪ corpus) — the one corpus-sized join
    * broadcasts it while small, AQE-shuffles when not; the bucket
    * assignment is map-only. */
  def leakageSafeSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
                       pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"pcts must be >= 0 with train+val <= 100, got $pctTrain/$pctVal")
    val groups = Dedup.duplicateGroups(pairs)
      .select(col("id").as(keyCol), col("label").as("__grp"))
    val withUnit = df.join(groups, Seq(keyCol), "left")
      .withColumn("split_unit", coalesce(col("__grp"), col(keyCol)))
    // type-checked on the RESOLVED unit column (string doc ids — URLs,
    // the crawl-curation case — take the xxhash64 path instead of
    // cast-to-null silently landing every row in "test")
    val b = hashBucket(keyForBucket(withUnit, "split_unit"), 100)
    withUnit
      .withColumn("split",
        when(b < pctTrain, "train")
          .when(b < pctTrain + pctVal, "val")
          .otherwise("test"))
      .drop("__grp")
  }

  /** Temperature-scaled mixture sampling — the multilingual/multi-
    * domain data-recipe step (the mBERT/XLM-R exponent-smoothing
    * scheme): target proportions p_d ∝ c_d^(1/τ), so τ > 1 upweights
    * small domains relative to their natural share. Given a global
    * budget of `budgetPerMille`/1000 of all rows, each domain keeps
    * rate_d = min(1, n_target·p_d / c_d) by the engine-portable
    * [[hashBucket]] membership at per-mille resolution.
    *
    * Determinism: domain sizes c_d are exact integers;
    * c_d^(1/τ) quantizes to 1e-6 units immediately (for τ = 2 the
    * root is an IEEE-exact `sqrt`; other τ use `pow` — correctly-
    * rounded on common libms for these magnitudes, but τ = 2 is the
    * cross-engine-guaranteed configuration and the declared one); the
    * rate then derives in ONE fixed-order double expression both
    * engines evaluate identically.
    *
    * Scale shape: one partial-agg count shuffle (domain-sized frame),
    * rates broadcast back, membership map-only — the corpus itself
    * never shuffles. */
  def temperatureSample(df: DataFrame, domainCol: String, keyCol: String,
                        budgetPerMille: Int, tau: Double = 2.0): DataFrame = {
    require(budgetPerMille > 0 && budgetPerMille <= 1000,
      s"budgetPerMille in (0,1000], got $budgetPerMille")
    require(tau >= 1.0, s"tau must be >= 1, got $tau")
    val a = 1.0 / tau
    def root(c: Column): Column =
      if (a == 0.5) sqrt(c.cast("double")) else pow(c.cast("double"), a)
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__q", floor(root(col("__c")) * lit(1e6)).cast("long"))
    val totals = counts.agg(sum(col("__c")).as("__n"), sum(col("__q")).as("__sq"))
    // fixed-order double chain — mirrored textually in the SQL oracle
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("__ntarget",
        floor(col("__n").cast("double") * lit(budgetPerMille) / lit(1000.0)))
      .withColumn("__rate", least(lit(1000.0),
        floor(lit(1000.0) * col("__ntarget") * col("__q").cast("double") /
          (col("__sq").cast("double") * col("__c").cast("double")))))
      .select(col(domainCol), col("__rate"))
    df.join(broadcast(rates), domainCol)
      .filter(hashBucket(keyForBucket(df, keyCol), 1000) < col("__rate"))
      .drop("__rate")
  }

  /** Systematic probability-proportional-to-size sampling: ~`n` rows
    * with inclusion probability proportional to `weightCol`, fully
    * deterministic (a pure function of the data — no RNG), exact
    * integer arithmetic end to end so the selection is reproducible on
    * any engine.
    *
    * The classic survey-sampling design: quantize weights to integers
    * (scale `weightScale`), lay rows on the cumulative-weight axis in
    * `keyCol` order, drop `n` equi-spaced thresholds t_m = ⌈m·W/n⌉,
    * and keep every row whose weight interval (cum−w, cum] contains a
    * threshold. Rows heavier than W/n are always selected (their
    * interval must contain a threshold); w ≤ 0 rows never are.
    *
    * Scale shape: the cumulative sum is DISTRIBUTED — the same
    * range-repartition + per-partition-offset pattern as
    * [[graft.ops.Indexing.globalIndex]] (one metadata-sized offsets
    * aggregate broadcast back; no single-reducer global window), with
    * the same `checkpointMode` barrier semantics (local | reliable |
    * persist) because range boundaries are sampled
    * nondeterministically and two plan branches consume the layout.
    * The n thresholds broadcast; selection is a broadcast semi-join.
    *
    * Overflow bound (asserted at runtime, metadata-sized check):
    * n · W·10^s must fit in a long — pick `weightScale` accordingly
    * (s=2 holds to ~9·10^16 of raw weight at n=1000). */
  def systematicSample(df: DataFrame, keyCol: String, weightCol: String,
                       n: Int, weightScale: Int = 2,
                       checkpointMode: String = "local"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(weightScale >= 0 && weightScale <= 6,
      s"weightScale in [0,6], got $weightScale")
    val scale = math.pow(10, weightScale).toLong
    val base = df
      .withColumn("__wq",
        floor(col(weightCol) * lit(scale) + lit(0.5)).cast("long"))
      .filter(col("__wq") > 0)
    val parts = Indexing.materialize(
      base.repartitionByRange(col(keyCol))
        .sortWithinPartitions(keyCol)
        .withColumn("__pid", spark_partition_id()), checkpointMode)
    val perPart = parts.groupBy(col("__pid"))
      .agg(sum(col("__wq")).as("__wn"))
    val offsets = perPart
      .withColumn("__off",
        coalesce(
          sum(col("__wn")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    val thresholds = perPart.agg(sum(col("__wn")).as("__W"))
      // assert_true is NULL on pass — the filter keeps the row and the
      // job dies with the message if the threshold math would overflow.
      // coalesce: an EMPTY input sums to null __W, which must pass (and
      // then selects nothing), not throw
      .filter(assert_true(
        coalesce(col("__W") <= lit(Long.MaxValue / n), lit(true)),
        lit(s"systematicSample: n*W overflows long — lower weightScale ($weightScale) or n ($n)")).isNull)
      .select(explode(sequence(lit(1L), lit(n.toLong))).as("__m"),
        col("__W"))
      .select(expr(s"(__m * __W + ${n - 1}) div $n").as("__t"))
    val cum = parts
      .join(broadcast(offsets), "__pid")
      .withColumn("__cum",
        col("__off") + sum(col("__wq")).over(
          Window.partitionBy(col("__pid")).orderBy(col(keyCol))))
    cum
      .join(broadcast(thresholds),
        col("__t") > col("__cum") - col("__wq") && col("__t") <= col("__cum"),
        "left_semi")
      .drop("__wq", "__pid", "__off", "__cum")
  }
}
