package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * (greatest right time ≤ left time) with the same key — the
  * point-in-time lookup Spark lacks natively (preference (a) of the
  * build rules: composed from built-ins, no custom physical operator
  * needed).
  *
  * Implementation is the union + running-last trick, not a join: tag
  * both sides, union them, and take `last(right columns, ignoreNulls)`
  * over a (key, time)-ordered window. One shuffle on the key, no
  * per-row probing, no range-join explosion — each partition is a
  * single ordered sweep, which is exactly the merge-scan an as-of join
  * wants at 100 TB. Right rows sort before left rows at equal times, so
  * the match is inclusive (≤).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (must be unique per (key, time) —
    *                   pre-aggregate otherwise; ties have no defined winner)
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   left ordering column (numeric/date)
    * @param rightTime  right ordering column (same type)
    * @param rightCols  right columns to attach */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val (u, leftCols) = unionFrame(left, right, leftKey, rightKey,
      leftTime, rightTime, rightCols, withRt = false)
    finish(u.withColumn("__right", runningLast(sweep(asc = true))),
      leftCols, rightCols)
  }

  /** Forward as-of: attach the EARLIEST right row at-or-after the left
    * time (the "next quote/reading" lookup — pandas merge_asof
    * direction='forward'). Same single-shuffle ordered sweep, scanned
    * in descending time. */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String]): DataFrame = {
    val (u, leftCols) = unionFrame(left, right, leftKey, rightKey,
      leftTime, rightTime, rightCols, withRt = false)
    finish(u.withColumn("__right", runningLast(sweep(asc = false))),
      leftCols, rightCols)
  }

  /** Nearest as-of: attach whichever right row is closest in time, the
    * backward match on a distance tie (pandas merge_asof
    * direction='nearest' tie-break). Both ordered sweeps run over ONE
    * union frame — the two windows share the partition key, so
    * Catalyst plans one hash exchange with two sorts; still no
    * range-join explosion. Time columns must be numeric (epoch
    * seconds/micros …) so distances subtract and compare. */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String]): DataFrame = {
    val (u, leftCols) = unionFrame(left, right, leftKey, rightKey,
      leftTime, rightTime, rightCols, withRt = true)
    val distBack = col("__t") - col("__rb.__rt") // ≥ 0 by construction
    val distFwd = col("__rf.__rt") - col("__t")
    finish(
      u.withColumn("__rb", runningLast(sweep(asc = true)))
        .withColumn("__rf", runningLast(sweep(asc = false)))
        .withColumn("__right",
          when(col("__rb").isNull, col("__rf"))
            .when(col("__rf").isNull, col("__rb"))
            .when(distBack <= distFwd, col("__rb"))
            .otherwise(col("__rf"))),
      leftCols, rightCols)
  }

  /** The most recent right-row struct at-or-before the current row in
    * the sweep's direction. The right row travels as ONE struct:
    * filling columns independently with last(_, ignoreNulls) would skip
    * legitimate nulls inside the most recent right row (and could even
    * stitch values from different right rows). The struct itself is
    * never null on right rows, so ignoreNulls applies to row presence,
    * not field values. */
  private def runningLast(w: WindowSpec): Column =
    last(col("__right"), ignoreNulls = true).over(w)

  /** Inclusive in both directions: right rows sort before left rows at
    * equal times, whichever way the sweep runs. */
  private def sweep(asc: Boolean): WindowSpec = {
    val ord = if (asc) col("__t").asc else col("__t").desc
    Window.partitionBy(col("__key"))
      .orderBy(ord, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
  }

  /** Tagged union of the two sides: (__key, __t, __is_left, left
    * columns, __right struct). Only when `withRt` (the nearest
    * variant's distance compare) does the struct carry the right time
    * as `__rt` — backward/forward never read it, and it would be a
    * second copy of the time column through the operator's dominant
    * shuffle. Returns the frame and the left column names for the
    * final projection. */
  private def unionFrame(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         rightCols: Seq[String],
                         withRt: Boolean)
    : (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"rightCols must not collide with left columns: " +
        rightCols.intersect(leftCols).mkString(", "))
    val rtField =
      if (withRt) Seq(org.apache.spark.sql.types.StructField(
        "__rt", right.schema(rightTime).dataType))
      else Seq.empty
    val rowStructType = org.apache.spark.sql.types.StructType(
      rtField ++ rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select(Seq(col("__key"), col("__t"), col("__is_left")) ++
        leftCols.map(col) :+
        lit(null).cast(rowStructType).as("__right"): _*)
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select(Seq(col("__key"), col("__t"), col("__is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((if (withRt) Seq(col(rightTime).as("__rt")) else Seq.empty) ++
          rightCols.map(col): _*)
          .as("__right"): _*)
    (l.unionByName(r), leftCols)
  }

  private def finish(withRight: DataFrame, leftCols: Seq[String],
                     rightCols: Seq[String]): DataFrame =
    withRight
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__right.$c").as(c)): _*)
}
