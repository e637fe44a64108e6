package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.{GraftQueries, Tables}

class StreamingOpsSpec extends AnyFunSuite with SparkSpec {

  test("tumblingCounts on a batch frame equals manual day-grouping") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val got = StreamingOps.tumblingCounts(events, "ts", "event_type", "1 day")
    val manual = events
      .groupBy(date_trunc("day", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    assert(got.count() == manual.count())
    val g = got.agg(sum("n")).head().getLong(0)
    assert(g == events.count())
  }

  test("q_stream_window emits every real window through the watermark") {
    val out = GraftQueries.streamWindow(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // all 10k sf0.001... 1k events at sf0.001 accounted for in flushed windows
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    assert(rows.map(_.getAs[Long]("n")).sum == events.count())
  }

  test("simhash SQL function registered via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // fresh session (new sessionState) on the existing context, with
      // the engine's extensions installed
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val df = s2.sql("SELECT graft_simhash64(array('a','b','c')) AS h")
      assert(df.head().getLong(0) != 0L)
      val row = s2.sql(
        """SELECT graft_redact_pii('mail a@b.io now') AS r,
          |       graft_fingerprint('  Hello   World ') AS f1,
          |       graft_fingerprint('hello world') AS f2""".stripMargin)
        .head()
      assert(row.getString(0) == "mail <EMAIL> now")
      assert(row.getString(1) == row.getString(2))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
