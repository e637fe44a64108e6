package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics primitives over (user, timestamp, type, value)
  * streams: ordered conversion funnels, cohort retention, and
  * per-group z-score outliers — the product-analytics trio every
  * event warehouse reimplements, expressed as single-pass Spark
  * aggregations.
  */
object Analytics {

  private val IntervalRe = "^[0-9]+ [a-z]+$".r

  /** Ordered conversion funnel: how many users performed `steps` in
    * strict temporal order, each step within `window` of the previous
    * one. Stage k's time is the EARLIEST qualifying event after stage
    * k-1 (greedy-earliest semantics — deterministic, and the standard
    * funnel definition). Output: (stage 1-based, users).
    *
    * Scale shape: ONE shuffle — events filtered to the step types and
    * grouped per user with a sorted timestamp array per step
    * (collect_list partial-aggregates map-side), then the whole
    * stage cascade is per-user array algebra (array_min over a
    * filtered array per stage) and the stage counts collapse in a
    * single-row aggregate unpivoted via struct-array explode. No
    * self-joins, no repeated event scans. Caveat, documented: a
    * user's per-step event list is materialized as one array — same
    * hot-key bound as sessionization; filter bot-grade users first
    * if a single user can hold millions of one step's events. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             window: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    require(IntervalRe.pattern.matcher(window).matches,
      s"window must look like '24 hours', got '$window'")
    val perUser = df
      .filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(when(col(typeCol) === steps.head,
          col(tsCol)))).as("__ts_0"),
        steps.tail.zipWithIndex.map { case (s, i) =>
          sort_array(collect_list(when(col(typeCol) === s, col(tsCol))))
            .as(s"__ts_${i + 1}")
        }: _*)
    // stage-time cascade: t0 = first step-0 event; tk = earliest
    // step-k event with t(k-1) < ts <= t(k-1) + window. Each stage is
    // materialized as its own column so `prev` is a plain attribute
    // REFERENCE — inlining the previous stage's expression (used twice
    // per level) would grow the tree 2^steps and hang analysis on
    // long funnels (CollapseProject leaves multiply-referenced
    // non-trivial projections alone, so growth stays linear)
    val w = expr(s"interval $window")
    val staged = steps.indices.foldLeft(perUser) { (df, i) =>
      val ts = col(s"__ts_$i")
      val t = // try_: a user with no step-0 events has an empty array
        if (i == 0) try_element_at(ts, lit(1))
        else {
          val prev = col(s"__t_${i - 1}")
          array_min(filter(ts, x => x > prev && x <= prev + w))
        }
      df.withColumn(s"__t_$i", t)
    }.select(steps.indices.map(i => col(s"__t_$i")): _*)
    staged
      .agg(count(col("__t_0")).as("__c_0"),
        steps.indices.tail.map(i =>
          count(col(s"__t_$i")).as(s"__c_$i")): _*)
      .select(explode(array(steps.indices.map(i => struct(
        lit(i + 1).as("stage"),
        col(s"__c_$i").as("users"))): _*)).as("p"))
      .select("p.*")
  }

  /** Cohort retention: users bucketed by their first-activity day
    * (the cohort), counted per (cohort day, day offset) of later
    * activity — the retention-curve input. Output:
    * (cohort_day, day_offset, n_users).
    *
    * Scale shape: cohort day is a whole-partition window min over the
    * user hash partitioning (one shuffle, no join, no second scan of
    * the events), then one distinct-count aggregate. Window
    * partitions are per-USER — high cardinality, skew-free — not
    * per-cohort. */
  def cohortRetention(df: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val day = date_trunc("day", col(tsCol))
    val w = Window.partitionBy(col(userCol))
    df.select(col(userCol), day.as("__day"))
      .withColumn("cohort_day", min(col("__day")).over(w))
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Rows whose `valueCol` sits more than `threshold` sample standard
    * deviations from their group's mean — the interpretable outlier
    * cut for monitoring and data validation. Emits the z-score;
    * groups with fewer than 2 rows (undefined stddev) or constant
    * values (sd = 0, z would be NaN) produce no outliers. The
    * threshold compares the UNROUNDED z.
    *
    * Scale shape: per-group mean/stddev is a tiny partial-agg
    * aggregate broadcast back onto the events — two scans of the
    * input, zero data-sized shuffles. The window-function alternative
    * (stats over partitionBy(group)) is one scan but hot-spots every
    * row of a group onto one reducer when the group cardinality is
    * low — exactly the monitoring case (handful of event types). */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("__mu"),
        stddev_samp(col(valueCol)).as("__sd"))
    val z = (col(valueCol) - col("__mu")) / col("__sd")
    // __sd > 0 guard: a constant group has sd = 0 exactly, making
    // z = 0/0 = NaN — and NaN compares GREATER than any double in
    // Spark's total order, so without the guard every row of a
    // flat-lined group would be emitted as an "outlier"
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col("__sd") > 0 && abs(z) > threshold)
      .withColumn("z", z)
      .drop("__mu", "__sd")
  }

  /** Consistency constant making 1.4826·MAD estimate σ under
    * normality. */
  val MadSigma = 1.4826

  /** Robust (median/MAD) outliers: rows with
    * |value − median(group)| > threshold·1.4826·MAD(group), where MAD
    * is the median absolute deviation from the group median — the cut
    * that survives what breaks [[zScoreOutliers]]: a few extreme
    * points inflate the mean AND the stddev until they mask
    * themselves; medians don't move. Emits `z_mad` (the robust
    * z-score). Groups with MAD = 0 (a majority-constant column)
    * produce no outliers — every deviation would be infinitely many
    * MADs out, which reads as noise, not signal.
    *
    * Scale shape: two tiny per-group aggregates (exact `percentile` —
    * swap `percentile_approx` in at corpus scale, same shape), each
    * broadcast back — three scans of the input, zero data-sized
    * shuffles, same low-cardinality-group reasoning as
    * [[zScoreOutliers]]. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(abs(col(valueCol) - col("__med")), lit(0.5))
        .as("__mad"))
    val z = (col(valueCol) - col("__med")) / (lit(MadSigma) * col("__mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(col("__mad") > 0 && abs(z) > threshold)
      .withColumn("z_mad", z)
      .drop("__med", "__mad")
  }

  /** Cumulative distinct users by day — the growth curve. Spark
    * windows can't run `count(distinct)` cumulatively; the standard
    * decomposition is exact and cheap: each user's FIRST activity day
    * (one groupBy), daily new-user counts, then a running sum. Output:
    * (day, new_users, cum_users).
    *
    * Scale shape: one user-keyed aggregate (the only data-sized
    * shuffle), then a days-cardinality frame; the running-sum window
    * is single-partition BY DESIGN over that tiny frame (the
    * aggregate-then-window shape — a global order over ~10³ day rows,
    * not over events). */
  def cumulativeUsers(df: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val firstDay = df.groupBy(col(userCol))
      .agg(min(date_trunc("day", col(tsCol))).as("day"))
    val daily = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Rolling N-day active users (DAU/WAU/MAU family): for every day
    * that has events, the distinct users active in the trailing
    * `windowDays`-day window ending that day. Exact, not sketched.
    * Output: (obs_day, active_users).
    *
    * Scale shape: distinct (user, day) first (one shuffle — collapses
    * event volume to user-day grain), each user-day then fans out
    * map-side into its `windowDays` observation days, observation days
    * are bounded to REAL event days by a broadcast semi-join against
    * the tiny day list, and one distinct-count aggregate finishes. The
    * fan-out multiplies the user-day frame, not the event stream —
    * the standard exact-rolling-distinct trade. */
  def rollingActive(df: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays must be > 0, got $windowDays")
    val userDays = df
      .select(col(userCol), date_trunc("day", col(tsCol)).as("__day"))
      .distinct()
    val obsDays = userDays.select(col("__day").as("obs_day")).distinct()
    val fanned = userDays.select(col(userCol),
      explode(sequence(col("__day"),
        col("__day") + expr(s"interval ${windowDays - 1} days"),
        expr("interval 1 day"))).as("obs_day"))
    fanned.join(broadcast(obsDays), Seq("obs_day"), "left_semi")
      .groupBy(col("obs_day"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** Multi-touch attribution, first- and last-touch models in one
    * pass: every conversion event is credited to the channel of the
    * FIRST and the LAST preceding touch event in the same user's
    * history ('direct' when the user converted with no prior touch).
    * Output: (channel, model, conversions, revenue) — one row per
    * (channel, model ∈ {first_touch, last_touch}) pair.
    *
    * Scale shape: one shuffle — the per-user ordered window computes
    * running first/last touch with IGNORE NULLS (no self-join of
    * conversions against touches, the naive formulation that
    * re-scans the event table per model), then a partial-aggregated
    * groupBy on (channel, model) collapses to |channels|·2 rows. The
    * two models share the single sorted pass. */
  def attribution(df: DataFrame, userCol: String, orderCols: Seq[String],
                  typeCol: String, valueCol: String,
                  touchTypes: Seq[String],
                  conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs touch types")
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes.map(lit): _*),
      col(typeCol))
    val credited = df
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
    // both models leave the single window pass as a map-side 2-element
    // explode — a union of two selects would re-plan (and re-shuffle)
    // the window once per model
    credited
      .select(explode(array(
        struct(coalesce(col("__first"), lit("direct")).as("channel"),
          lit("first_touch").as("model")),
        struct(coalesce(col("__last"), lit("direct")).as("channel"),
          lit("last_touch").as("model")))).as("__m"),
        col(valueCol).as("__v"))
      .select(col("__m.channel").as("channel"),
        col("__m.model").as("model"), col("__v"))
      .groupBy(col("channel"), col("model"))
      .agg(count(lit(1)).as("conversions"),
        graft.queries.Tables.dsum(col("__v")).as("revenue"))
  }

  /** User-path mining: each key's first `depth` ordered events join
    * into a path string ("view>click>purchase"), then paths count —
    * the product-analytics "common journeys" view. One key-partitioned
    * window (rank + bounded collect share the shuffle) and one
    * path-keyed count; path strings are depth-bounded, so row width
    * stays fixed no matter how long a user's history is.
    *
    * Determinism: the order columns must totally order each key's
    * rows (pass a unique tiebreaker); ties would otherwise make the
    * path engine-dependent. */
  def userPaths(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                stepCol: String, depth: Int): DataFrame = {
    require(depth > 0, s"depth must be positive, got $depth")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= depth)
      .groupBy(col(keyCol))
      .agg(concat_ws(">",
        array_sort(collect_list(struct(col("__rk").as("r"),
          col(stepCol).cast("string").as("s")))).getField("s"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Two-sample A/B comparison per experiment arm pair: for each
    * metric group, Welch's z statistic on the arm means — the
    * experiment-readout query every product warehouse runs. Moments
    * come from EXACT decimal-quantized sums ([[graft.queries.Tables
    * .iscale]] semantics at `scale` decimals), so the statistic is
    * partition-order independent and cross-engine hash-matchable;
    * one aggregation pass over (group, arm), driver-free.
    * Output: one row per group — n/mean per arm, diff, z (null when
    * either arm lacks 2 rows or variance degenerates to 0/0). */
  def abTest(df: DataFrame, groupCol: String, armCol: String,
             valCol: String, armA: String, armB: String,
             scale: Int = 4): DataFrame = {
    val q = graft.queries.Tables.iscale(col(valCol), scale)
    val s = math.pow(10, scale)
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // square in DECIMAL, not Long: q² wraps a Long silently past
    // |value| ≈ 3·10^(14-scale)·10^-4 — decimal(18)×decimal(18) is
    // exact to 10^37 (the dsum no-overflow discipline)
    val q2 = q.cast(d18) * q.cast(d18)
    def armAgg(arm: String, tag: String) = Seq(
      sum(when(col(armCol) === arm, lit(1L)).otherwise(lit(0L)))
        .as(s"n_$tag"),
      sum(when(col(armCol) === arm, q).otherwise(lit(0L)).cast(d38))
        .as(s"__sx_$tag"),
      sum(when(col(armCol) === arm, q2)
        .otherwise(lit(0L).cast(d18) * lit(0L).cast(d18)))
        .as(s"__sxx_$tag"))
    def mean(tag: String) =
      // guarded: an empty arm has NO mean — null, not an engine-
      // dependent 0/0 artifact
      when(col(s"n_$tag") >= 1,
        (col(s"__sx_$tag").cast("double") / col(s"n_$tag")) / lit(s))
    def variance(tag: String) =
      ((col(s"n_$tag") * col(s"__sxx_$tag") -
        col(s"__sx_$tag") * col(s"__sx_$tag")).cast("double") /
        (col(s"n_$tag").cast("double") *
          (col(s"n_$tag") - lit(1)).cast("double"))) / lit(s * s)
    val aggs = armAgg(armA, "a") ++ armAgg(armB, "b")
    df.filter(col(armCol).isin(armA, armB) && col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_a", mean("a"))
      .withColumn("mean_b", mean("b"))
      .withColumn("diff", col("mean_b") - col("mean_a"))
      .withColumn("z",
        when(col("n_a") >= 2 && col("n_b") >= 2,
          col("diff") / sqrt(variance("a") / col("n_a") +
            variance("b") / col("n_b"))))
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("diff"), col("z"))
  }

  /** Group-mean imputation: fill `valCol` nulls with the group's
    * exact mean of the NON-null values — the standard feature
    * cleanup before models that can't take missing values. One
    * partial-agg pass for the means (decimal-exact, deterministic),
    * broadcast back, map-only fill; appends `<valCol>_f` and
    * `<valCol>_was_null`. Groups that are ALL null stay null (no
    * mean exists — inventing 0 would be a silent lie). */
  def imputeGroupMean(df: DataFrame, groupCol: String,
                      valCol: String): DataFrame = {
    val means = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.queries.Tables.davg(col(valCol)).as("__gm"))
    df.join(broadcast(means), Seq(groupCol), "left")
      .withColumn(s"${valCol}_f", coalesce(col(valCol), col("__gm")))
      .withColumn(s"${valCol}_was_null", col(valCol).isNull)
      .drop("__gm")
  }

  /** Winsorized clipping: cap `valCol` to its per-group exact
    * [pLo, pHi] percentile band — the outlier treatment that keeps
    * every row (unlike a filter) while bounding tail influence, the
    * standard pre-normalization step for reward/quality signals.
    *
    * Scale shape: one partial-agg percentile pass produces a
    * group-count-sized bounds frame, broadcast back onto the fact
    * side — the clip itself is map-only, no second shuffle. Exact
    * percentiles shuffle each group's values to one reducer per
    * group; for corpus-scale groups swap `percentile_approx` in (same
    * shape, mergeable sketch). Appends `<valCol>_w`. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val bounds = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($valCol, $pLo)").as("__lo"),
      expr(s"percentile($valCol, $pHi)").as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      // null guard: greatest/least SKIP nulls, so an unguarded clip
      // would turn a missing measurement into the p-lo bound — a
      // fabricated value. Null in, null out.
      .withColumn(s"${valCol}_w",
        when(col(valCol).isNotNull,
          least(greatest(col(valCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }
}
