package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins — the
  * step that turns a cleaned corpus into training-ready context-window
  * groups ("fill each 2048-token sequence with documents").
  *
  * Globally-greedy packing is inherently sequential (bin i+1 depends on
  * everything before it), so the scalable form packs WITHIN independent
  * shards: any corpus partitioning (ingest date, hash of id, …) works,
  * each shard packs in parallel with a window that never crosses
  * shards, and the cost is at most one underfull trailing bin per
  * shard — negligible when shards hold thousands of documents. The
  * shard column is the unit of parallelism at 100 TB; nothing here
  * ever sees the corpus in one ordered stream.
  */
object Packing {

  /** One row per document with its shard, token count, and assigned
    * bin. Documents pack in `idCol` order within each shard; a
    * document lands in bin floor(tokens-before-it / budget) — the
    * running-total form of first-fit packing (documents may straddle a
    * boundary; budget overflow within a bin is bounded by one
    * document, the standard concat-then-chunk training layout).
    * Deterministic: ordering is (shard, id). */
  def packByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                        shard: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    // ROWS frame, not the default RANGE: RANGE aggregates all order-key
    // PEERS together, so duplicate ids in a shard would share one
    // inflated cumulative sum instead of packing sequentially
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), shard.as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tokens")) / lit(budget.toLong))
          .cast("long"))
      .drop("__cum")
  }

  /** Per-(shard, bin) packing summary: document count and token total
    * — what a pipeline reports (and feeds the sequence writer) after
    * packing. */
  def packingSummary(df: DataFrame, idCol: String, textCol: String,
                     shard: Column, budget: Int): DataFrame =
    packByTokenBudget(df, idCol, textCol, shard, budget)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"))
}
