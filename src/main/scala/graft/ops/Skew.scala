package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution concentrates on a
  * few hot values — the classic 100 TB failure mode where one reducer
  * receives a whole key's rows while the rest of the cluster idles.
  *
  * Salting splits each hot key into `salts` sub-keys: the large side
  * gets a deterministic per-row salt, the small side is replicated once
  * per salt value, and the join runs on (key, salt) — hot keys now
  * spread over `salts` reducers. Row-for-row identical to the unsalted
  * join (each large row meets exactly one copy of its partner).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins at runtime; explicit salting still matters for
  * aggregate-under-join shapes, deterministic layouts, and engines/
  * paths AQE does not rewrite.
  */
object Skew {

  /** Salted inner equi-join. `saltSource` must be a column of the large
    * side whose values spread within each key group (a row id, line
    * number, timestamp …) — the salt is a hash of it, so results are
    * deterministic across partitionings and runs.
    *
    * The small side is replicated `salts`× via explode — keep it
    * broadcast-sized per usual salting practice (its copies are what
    * buys the skew spread). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = large.withColumn("__graft_salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, (keys :+ "__graft_salt").toSeq, "inner").drop("__graft_salt")
  }
}
