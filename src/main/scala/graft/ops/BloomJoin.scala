package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction: shrink the big side of a join to
  * (approximately) the rows that can match BEFORE the join's shuffle.
  *
  * At 100 TB the dominant cost of `big ⋈ small` is shuffling `big`;
  * when the join is selective (most big rows match no small key), a
  * Bloom filter of the small side's keys — a megabyte-scale sketch for
  * millions of keys — filters `big` map-side, so only plausible
  * matches reach the exchange. False positives are removed by the
  * exact join that follows, so the result is row-for-row identical to
  * the plain join; false negatives are impossible (Bloom guarantee).
  *
  * Spark's own runtime bloom join (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`) injects the same shape inside one query when
  * cost heuristics fire; this operator makes it explicit and gives the
  * sketch a life outside the query — build once from the dimension
  * frame, reuse across many pipelines (the serialized filter is a
  * persistable artifact, like the banded-signature dedup index).
  *
  * Uses Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (codegen'd, no UDF): the aggregate builds the sketch
  * distributed (partial filters OR-merged at the reduce), and only the
  * sketch bytes reach the driver — never the keys.
  */
object BloomJoin {

  /** Serialized Bloom filter of `keyCol`'s values. Keys of ANY type
    * enter the sketch as `xxhash64(key)` — the same hash is applied on
    * the probe side, so false negatives stay impossible for string/
    * date/decimal keys too (a cast-to-long would null non-numeric keys
    * and silently drop their matches). Distributed build; driver
    * receives `optimalNumOfBits/8` bytes (~0.9 MB for 1M keys at 1%
    * fpp), independent of row count.
    *
    * `expectedItems` is capped by
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) — raise that conf for larger dimension snapshots. */
  def keyBloom(df: DataFrame, keyCol: String,
               expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bytes = keyBloomOpt(df, keyCol, expectedItems, fpp)
    require(bytes.isDefined, s"no rows to build a Bloom filter from ($keyCol)")
    bytes.get
  }

  /** [[keyBloom]], but None when the frame has no rows (the aggregate
    * yields a null sketch) instead of failing. */
  def keyBloomOpt(df: DataFrame, keyCol: String,
                  expectedItems: Long, fpp: Double = 0.01)
    : Option[Array[Byte]] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val cap = df.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000")
      .toLong
    require(expectedItems <= cap,
      s"expectedItems=$expectedItems exceeds " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$cap — " +
        "raise the conf for larger dimension snapshots")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits))
    Option(df
      .agg(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0))
  }

  /** Codegen'd membership predicate over a serialized filter from
    * [[keyBloom]]. True ⇒ maybe present; false ⇒ definitely absent.
    * Null keys hash to the seed constant and pass the sketch; the
    * exact join's null-rejecting equality still drops them, so the
    * end-to-end contract is unaffected. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** Inner equi-join with the big side Bloom-prefiltered by the small
    * side's keys. Row-for-row identical to
    * `big.join(small, big(bigKey) === small(smallKey))` — the exact
    * join discards Bloom false positives — but only surviving big rows
    * are shuffled (or compared, if the small side broadcasts). */
  def bloomPrefilterJoin(big: DataFrame, bigKey: String,
                         small: DataFrame, smallKey: String,
                         expectedItems: Long,
                         fpp: Double = 0.01): DataFrame = {
    // empty small side ⇒ empty plain-join result, not an error
    val prefilter = keyBloomOpt(small, smallKey, expectedItems, fpp)
      .map(bloom => mightContain(bloom, col(bigKey)))
      .getOrElse(lit(false))
    // frame-qualified keys: unqualified col() would be ambiguous
    // whenever both frames carry the key name
    big.filter(prefilter).join(small, big(bigKey) === small(smallKey))
  }
}
