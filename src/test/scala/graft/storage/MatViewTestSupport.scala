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
}
