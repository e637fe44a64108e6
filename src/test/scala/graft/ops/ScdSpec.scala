package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScdSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def feed = Seq(
    // key 1: A, A (collapse), B, B (collapse), A — 3 runs
    (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 4L, "B"),
    (1L, ts("2024-01-05 00:00:00"), 5L, "A"),
    // key 2: single run, never changes
    (2L, ts("2024-01-01 12:00:00"), 6L, "X"),
    (2L, ts("2024-01-06 12:00:00"), 7L, "X"),
    // key 3: equal-timestamp tiebreak on the second order column
    (3L, ts("2024-01-02 00:00:00"), 9L, "Q"),
    (3L, ts("2024-01-02 00:00:00"), 8L, "P")
  ).toDF("k", "t", "seq", "attr")

  test("scd2FromChanges collapses runs and numbers versions") {
    val dim = Scd.scd2FromChanges(feed, "k", Seq("t", "seq"), Seq("attr"))
    val k1 = dim.filter($"k" === 1).orderBy("version")
      .select("attr", "version", "is_current").as[(String, Int, Boolean)]
      .collect().toSeq
    assert(k1 == Seq(("A", 1, false), ("B", 2, false), ("A", 3, true)))
    // run 1 closes when run 2 opens
    val r1 = dim.filter($"k" === 1 && $"version" === 1)
      .select("effective_from", "effective_to")
      .as[(Timestamp, Timestamp)].head()
    assert(r1 == ((ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))))
    // single-run key: one open row
    assert(dim.filter($"k" === 2).count() == 1)
    assert(dim.filter($"k" === 2).select("is_current").as[Boolean].head())
    // equal timestamps: seq orders P after Q? seq 8 < 9 so P first, Q second
    val k3 = dim.filter($"k" === 3).orderBy("version")
      .select("attr").as[String].collect().toSeq
    assert(k3 == Seq("P", "Q"))
  }

  test("scd2Apply(fold at T) equals the full rebuild, for every split point") {
    val full = Scd.scd2FromChanges(feed, "k", Seq("t", "seq"), Seq("attr"))
    for (cut <- Seq("2024-01-01 06:00:00", "2024-01-02 00:00:00",
        "2024-01-03 12:00:00", "2024-01-05 00:00:00")) {
      val base = Scd.scd2FromChanges(feed.filter($"t" <= ts(cut)),
        "k", Seq("t", "seq"), Seq("attr"))
      val inc = feed.filter($"t" > ts(cut))
      val folded = Scd.scd2Apply(base, inc, "k", Seq("t", "seq"), Seq("attr"))
      assertDfEqual(folded, full)
    }
  }

  test("scd2Apply with an unchanged-attribute batch row extends the open run, no new version") {
    val base = Scd.scd2FromChanges(feed.filter($"k" === 2),
      "k", Seq("t", "seq"), Seq("attr"))
    val inc = Seq((2L, ts("2024-02-01 00:00:00"), 10L, "X"))
      .toDF("k", "t", "seq", "attr")
    val folded = Scd.scd2Apply(base, inc, "k", Seq("t", "seq"), Seq("attr"))
    assert(folded.count() == 1)
    val row = folded.select("attr", "version", "is_current")
      .as[(String, Int, Boolean)].head()
    assert(row == (("X", 1, true)))
  }
}
