package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edges derived from event streams: Markov
  * transition counts and an exact-deterministic PageRank.
  *
  * PageRank here is computed entirely in SCALED-INTEGER arithmetic
  * (ranks in 1e-9 units, edge probabilities in 1e-6 units, every
  * division an explicit floor) — not for speed but for bit-exact
  * cross-engine determinism: double-precision power iteration is
  * partition-order dependent (the per-node contribution sum reorders),
  * whereas integer sums are associative-exact, so the same unrolled
  * computation in any SQL engine hash-matches Spark's answer. The
  * precision loss is ≤ 1e-6 relative per multiply — far below anything
  * a ranking consumer can observe.
  */
object Graph {

  /** Markov transition counts: for each consecutive pair of events per
    * key (ordered by `tsCol`, ties broken by the unique `tieCol` so the
    * sequence — and therefore the answer — is total-order
    * deterministic), count (prev_state → state) occurrences.
    *
    * Shape: ONE shuffle (the per-key window sort); the trailing
    * groupBy on (prev_state, state) partial-aggregates map-side to at
    * most |states|² rows. The standard event-sequence building block
    * (navigation graphs, funnel discovery, session Markov models). */
  def transitionCounts(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(stateCol).as("state"),
        lag(col(stateCol), 1).over(w).as("prev_state"))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col("state"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Power-iteration PageRank over a weighted edge table
    * (`srcCol`, `dstCol`, `weightCol`), damping `dampPct`/100, ranks
    * returned in 1e-9 units (`rank_scaled`) plus a double rendering.
    *
    * Exact-integer iteration: edge probability
    * p = floor(w·1e6 / out_w); contribution = floor(rank·p / 1e6);
    * rank' = floor(base/N) + floor(dampPct·Σcontrib / 100). All floors
    * on BIGINT — associative, engine-independent. Nodes = src ∪ dst;
    * sink nodes (no out-edges) leak their damped mass — the classic
    * "mass loss" formulation — identically on every engine.
    *
    * Scale shape: the edge table (already aggregated — |states|² for
    * Markov graphs, |V|+|E| generally) is localCheckpoint'ed ONCE so
    * the `iterations` chained join/agg rounds replay a materialized
    * edge block, not the full upstream lineage (the same bounded-
    * iteration pattern as [[Dedup]]'s connected components); each
    * round is one join keyed by src + one groupBy keyed by dst —
    * shuffle rows = |E|. The rank side is |V| rows. */
  def pageRankScaled(edges: DataFrame, srcCol: String, dstCol: String,
                     weightCol: String, iterations: Int,
                     dampPct: Int = 85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampPct > 0 && dampPct < 100, s"dampPct in (0,100), got $dampPct")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // floor division on non-negative BIGINTs: identical everywhere
    def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val prob = e.join(outW, "src")
      .select(col("src"), col("dst"),
        fdiv(col("w") * lit(1000000L), col("out_w")).as("p"))
      .localCheckpoint() // bounded-iteration barrier: edges are final here
    val nodes = prob.select(col("src").as("node"))
      .union(prob.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val base = nodes.crossJoin(broadcast(
        nodes.agg(count(lit(1)).as("__nv"))))
      .select(col("node"), fdiv(lit(1000000000L), col("__nv")).as("base"))
    var rank = base.select(col("node"), col("base").as("rank_scaled"))
    for (_ <- 1 to iterations) {
      val contrib = rank
        .join(prob, rank("node") === prob("src"))
        .select(col("dst"),
          fdiv(col("rank_scaled") * col("p"), lit(1000000L)).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      rank = base
        .join(contrib, base("node") === contrib("dst"), "left")
        .select(base("node"),
          (fdiv(col("base") * lit(100L - dampPct), lit(100L)) +
            fdiv(lit(dampPct.toLong) * coalesce(col("inflow"), lit(0L)),
              lit(100L))).as("rank_scaled"))
    }
    rank.select(col("node"), col("rank_scaled"),
      (col("rank_scaled").cast("double") / lit(1e9)).as("rank"))
  }
}
