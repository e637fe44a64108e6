package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series primitives: gap-filled resampling and
  * forward fill — the feature-engineering shapes behind activity
  * matrices, rate series, and sensor/telemetry cleanup, where "no row"
  * must become an explicit zero/carried value before models see it.
  */
object TimeSeries {

  private val IntervalRe = "^[0-9]+ [a-z]+$".r

  /** Per-key resample onto a dense time grid: bucket `tsCol` with
    * `date_trunc(unit)`, aggregate `aggs` per (key, bucket), then
    * LEFT-join the aggregates onto every grid point from each key's
    * min to max bucket stepped by `step` (e.g. "1 day"). Buckets with
    * no rows appear with null aggregate values — the caller picks the
    * fill (coalesce to 0 for counts, leave null for averages).
    * Output: keyCol, `bucket` (timestamp), then the aggregates.
    *
    * Scale shape: ONE data-sized shuffle (the bucket aggregate — with
    * map-side partial agg, so shuffle rows are (key, bucket) groups,
    * not events); the per-key min/max re-agg and the grid explode run
    * over the already-compact bucket frame, and the final join is
    * keyed (key, bucket) against grid rows. The bucket frame is
    * localCheckpoint'ed because BOTH the range frame and the join
    * probe side derive from it — without the barrier the corpus
    * aggregation would run twice (the tfIdf discipline). Rows with a
    * null timestamp survive as one null-bucket row per key (outer
    * explode), never silently dropped. Caveat, documented not hidden:
    * a single key spanning years at a seconds-level step produces a
    * grid array per key — pick `step` so span/step stays file-sized
    * (the explode is lazy, but the per-key array is materialized
    * row-wise). */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
               unit: String, step: String, aggs: Seq[Column]): DataFrame = {
    require(IntervalRe.pattern.matcher(step).matches,
      s"step must look like '1 day', got '$step'")
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    val bucketed = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode_outer(expr(s"sequence(__mn, __mx, interval $step)"))
          .as("bucket"))
    // null-safe on the bucket so the null-timestamp row keeps its
    // aggregates (plain USING-equality would null them out)
    val aggCols = bucketed.columns.filterNot(c =>
      c == keyCol || c == "bucket").toSeq
    grid.alias("__g").join(bucketed.alias("__b"),
        col(s"__g.$keyCol") <=> col(s"__b.$keyCol") &&
          col("__g.bucket") <=> col("__b.bucket"), "left_outer")
      .select(col(s"__g.$keyCol").as(keyCol) +:
        col("__g.bucket").as("bucket") +:
        aggCols.map(c => col(s"__b.$c")): _*)
  }

  /** Forward fill: for every column in `fillCols`, the last non-null
    * value at or before the current row within the key's
    * (`orderCols`-ordered) history, emitted as `<col>_filled` next to
    * the original. Rows before a key's first observation stay null
    * (there is nothing to carry). `orderCols` must be a total order
    * per key (include a unique id as tie-break) or fill-through-ties
    * is undefined.
    *
    * Scale shape: one hash shuffle on the key + one sort per
    * partition; ALL fill columns share the same window, so adding
    * columns adds no passes. The frame stays row-preserving — this is
    * the running-frame sibling of `last_value IGNORE NULLS`. */
  def forwardFill(df: DataFrame, keyCol: String, orderCols: Seq[String],
                  fillCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "forwardFill needs ordering columns")
    require(fillCols.nonEmpty, "forwardFill needs columns to fill")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Exponentially weighted moving average over a BOUNDED trailing
    * window: per key (ordered by `orderCols` — pass a total order),
    * `<valueCol>_ewma` = Σⱼ wⱼ·x₍ₜ₋ⱼ₎ / Σⱼ wⱼ with wⱼ = (1−α)ʲ over
    * the last `span` observations (fewer near a series head — the
    * denominator only sums weights of rows that exist, the standard
    * `adjust=true` EWM normalization).
    *
    * The unbounded-history EWMA recurrence is inherently sequential;
    * the distributed formulation either carries exploding powers
    * ((1−α)⁻ⁱ overflows past ~10³ rows) or loses associativity. The
    * bounded form is the scale-correct one: an explicitly unrolled
    * weighted sum of `span` `lag` terms in ONE shared window — one
    * shuffle + one sort per key regardless of span, every addition in
    * a fixed left-to-right order so the double result is deterministic
    * and engine-portable (the identical unrolled expression in any SQL
    * engine reproduces it bit-for-bit). Weights below ~1e-5·w₀ are a
    * span-choice concern, not a correctness one. */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double, span: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(span >= 1 && span <= 64, s"span in [1,64], got $span")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val terms = (0 until span).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      // j = 0 is the row's own value (lag-0 support differs across
      // engines, so neither side uses it)
      val x = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (when(x.isNotNull, x * lit(wj)).otherwise(lit(0.0d)),
        when(x.isNotNull, lit(wj)).otherwise(lit(0.0d)))
    }
    val num = terms.map(_._1).reduceLeft(_ + _)
    val den = terms.map(_._2).reduceLeft(_ + _)
    df.withColumn(s"${valueCol}_ewma", num / den)
  }

  /** Classical seasonal decomposition with anomaly flags over a daily
    * series (day, value): additive trend / seasonal / residual — the
    * moving-average STL-lite every metrics pipeline runs before
    * alerting, with every step deterministic enough to hash-match a
    * SQL twin:
    *
    *  - trend: centered `period`-day moving average as an UNROLLED
    *    lag/lead chain (fixed fold order — a frame-sum's fold order is
    *    engine-private, the [[ewma]] lesson), null until a full window
    *    exists;
    *  - seasonal: exact decimal-quantized mean of the detrended value
    *    per phase (day-index mod period — pure arithmetic, no
    *    dayofweek() locale variance);
    *  - residual = detrended − seasonal; anomaly when |residual| >
    *    `k` × mean |residual| (the MAD-flavored threshold — variance
    *    needs a float fold the engines won't agree on, mean-abs is
    *    exact under quantization).
    *
    * Scale note: the series here is the DAILY grain — bounded by the
    * calendar (3 650 rows per decade), so the single ordered window
    * is metadata-sized by construction; the heavy reduction from
    * events to days happens in the caller's partial-aggregated
    * groupBy. Gaps: decompose assumes a contiguous series — compose
    * with [[resample]] first when days can be missing. */
  def seasonalDecompose(daily: DataFrame, dayCol: String,
                        valueCol: String, period: Int = 7,
                        k: Double = 2.0): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(period % 2 == 1, s"centered MA needs an odd period, got $period")
    require(k > 0, s"k must be > 0, got $k")
    val half = period / 2
    val w = Window.orderBy(col(dayCol))
    val terms = (-half to half).map {
      case 0 => col(valueCol)
      case i if i < 0 => lag(col(valueCol), -i).over(w)
      case i => lead(col(valueCol), i).over(w)
    }
    val trended = daily
      .withColumn("trend",
        when(terms.map(_.isNotNull).reduce(_ && _),
          terms.reduceLeft(_ + _) / lit(period.toDouble)))
      .withColumn("phase",
        pmod(datediff(col(dayCol), lit("1970-01-01")), lit(period)))
      .withColumn("detrended", col(valueCol) - col("trend"))
    val seasonal = trended.filter(col("detrended").isNotNull)
      .groupBy(col("phase"))
      .agg(graft.queries.Tables.davg(col("detrended")).as("seasonal"))
    val withSeasonal = trended
      .join(broadcast(seasonal), Seq("phase"), "left")
      .withColumn("residual",
        when(col("detrended").isNotNull,
          col("detrended") - col("seasonal")))
    val madBar = withSeasonal.filter(col("residual").isNotNull)
      .agg(graft.queries.Tables.davg(abs(col("residual"))).as("__mabs"))
    withSeasonal.crossJoin(broadcast(madBar))
      .withColumn("is_anomaly",
        when(col("residual").isNotNull,
          abs(col("residual")) > lit(k) * col("__mabs")))
      .select(col(dayCol), col(valueCol), col("phase"), col("trend"),
        col("seasonal"), col("residual"), col("is_anomaly"))
  }

  /** Per-key union of overlapping [start, end] intervals — the
    * sweep-line primitive behind "time actually covered" metrics
    * (watch time, machine uptime, session coverage, SLA windows)
    * where naive sum(end - start) double-counts overlaps.
    *
    * Classic gaps-and-islands: within each key, ordered by (start,
    * end), an interval opens a NEW merged block iff its start lies
    * beyond the running max of all previous ends; the running count
    * of such opens labels each row with its block, and per-block
    * min(start)/max(end) give the merged extents.
    *
    * Output: one row per merged block — keyCol, block_start,
    * block_end, n_intervals. Callers aggregate further (total
    * coverage = sum(block_end - block_start)).
    *
    * Scale shape: ONE shuffle on the key (the window sort); the block
    * groupBy re-uses the same hash partitioning so it adds no second
    * exchange, and partial aggregation collapses blocks map-side. Per
    * partition the windows need one sort of that key's rows —
    * interval counts per key are event-scale, not corpus-scale, and a
    * pathologically hot key is a skew-salting case like any window.
    * Ties ((start, end) duplicates) are order-insensitive: the
    * running max and block labels come out identical whichever
    * duplicate sorts first, so the result is deterministic. */
  /** CUSUM change-point detection: per key, the order position where
    * the cumulative deviation from the key's mean peaks — the
    * classic single-change-point estimator (where a metric's level
    * shifted: deploy regressions, pricing changes, sensor drift).
    *
    * Exact integer arithmetic: with quantized values x (e.g. cents),
    * CUSUM_i = Σ₁..i(x − mean) is scaled by n to
    * T_i = n·cumsum_i − i·total — integers, so the argmax and its
    * tie-break (earliest position) are deterministic on any engine;
    * callers divide by n·scale to read the deviation in value units.
    * Overflow bound: |T| ≤ n·Σ|x| — fits a long to ~3·10⁹ value-rows
    * per key at cent scale; switch the two products to decimal for
    * corpus-scale keys.
    *
    * Scale shape: ONE shuffle on the key; the running sum, the
    * full-partition totals, and the argmax pick are three window
    * passes over the SAME partitioning (no re-exchange). Output: one
    * row per key — keyCol, cp_<orderCol> (position of the peak),
    * cusum (scaled T at the peak), n. */
  def changePoint(df: DataFrame, keyCol: String, orderCol: String,
                  quantizedCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val w = byKey.orderBy(col(orderCol))
    val scored = df
      .withColumn("__cum", sum(col(quantizedCol))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__tot", sum(col(quantizedCol))
        .over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__n", count(lit(1))
        .over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__t",
        col("__n") * col("__cum") - col("__i") * col("__tot"))
    scored
      .withColumn("__rk", row_number().over(
        byKey.orderBy(abs(col("__t")).desc, col(orderCol))))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col(orderCol).as(s"cp_$orderCol"),
        col("__t").as("cusum"), col("__n").as("n"))
  }

  def intervalUnion(df: DataFrame, keyCol: String,
                    startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new_block",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("__block",
        sum(col("__new_block"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__block"))
      .agg(
        min(col(startCol)).as("block_start"),
        max(col(endCol)).as("block_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__block")
  }
}
