package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The [[MatView]] contract stated ONCE for every suite that pins
  * view == recompute (MatViewSpec, MatViewPropertySpec, the streaming
  * maintenance case): per-key cnt / nncnt-by-decimal-cast /
  * decimal-exact sum / raw min / raw max, recomputed from the table
  * as it stands now. When the stored contract changes, this is the
  * one place the tests' mirror changes with it. */
object MatViewTestSupport {
  def recompute(spark: SparkSession, storage: BasicStorage, path: String,
                keys: Seq[String] = Seq("k"),
                valueCol: String = "v"): DataFrame =
    storage.read(path, "delta").groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        count(col(valueCol).try_cast("decimal(28,6)")).as("nncnt"),
        sum(col(valueCol).try_cast("decimal(28,6)"))
          .cast("decimal(28,6)").as("sum"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"))

  /** The MULTI-METRIC / no-min-max mirror ([[MatView.createMulti]]):
    * stats suffixed per value column when there is more than one
    * (the statName rule), extremes only in min/max mode. */
  def recomputeMulti(spark: SparkSession, storage: BasicStorage,
                     path: String, keys: Seq[String],
                     valueCols: Seq[String],
                     minMax: Boolean): DataFrame = {
    def n(stat: String, c: String) =
      if (valueCols.size == 1) stat else s"${stat}_$c"
    val aggs = count(lit(1)).as("cnt") +: valueCols.flatMap { c =>
      Seq(count(col(c).try_cast("decimal(28,6)")).as(n("nncnt", c)),
        sum(col(c).try_cast("decimal(28,6)"))
          .cast("decimal(28,6)").as(n("sum", c))) ++
        (if (minMax) Seq(min(col(c)).as(n("min", c)),
          max(col(c)).as(n("max", c)))
        else Nil)
    }
    storage.read(path, "delta").groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
