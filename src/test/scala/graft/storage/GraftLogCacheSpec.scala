package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The op-log record cache ([[GraftLog.readRecordsDir]]) is an
  * access-order LRU over immutable, write-once files. Eviction must be
  * invisible to callers: an evicted file simply re-reads on the next
  * miss. Pinned by squeezing the bound to one entry — every read then
  * evicts all but one parse and the record stream must stay complete
  * and identically ordered. */
class GraftLogCacheSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def st = new BasicStorage(spark)

  test("record-cache LRU: a 1-entry bound still serves the complete, " +
      "identically-ordered op log (eviction re-reads on miss)") {
    val path = tempDir("loglru") + "/t"
    st.write(Seq((1L, "a")).toDF("id", "k"), path, "delta", "overwrite")
    (2L to 6L).foreach { i =>
      st.merge(Seq((i, "a")).toDF("id", "k"), path,
        "full.id = incremental.id")
    }
    val full = GraftLog.records(spark, path)
    assert(full.size >= 6, s"expected one record per op, got ${full.size}")
    val old = GraftLog.recCacheMax
    try {
      GraftLog.recCacheMax = 1
      (1 to 3).foreach { _ =>
        assert(GraftLog.records(spark, path) == full,
          "an evicted parse must re-read identically")
      }
    } finally GraftLog.recCacheMax = old
  }
}
