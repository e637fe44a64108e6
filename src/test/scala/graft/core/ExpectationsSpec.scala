package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Expectations._

class ExpectationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("alice"), Some(10.0), "red"),
    (2L, Some("bob"), Some(200.0), "blue"),   // out of range
    (3L, None, Some(5.0), "red"),             // null name
    (3L, Some("carol"), None, "green"),       // dup id; green not allowed
    (4L, Some("Dave"), Some(-1.0), "red")     // bad case for regex
  ).toDF("id", "name", "v", "color")

  test("every rule counts its own violations in one pass") {
    val got = check(df, Seq(
        NotNull("name"),
        Unique(Seq("id")),
        InRange("v", 0, 100),
        OneOf("color", Seq("red", "blue")),
        Matches("name", "^[a-z]+$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(name)" -> 1L,
      "unique(id)" -> 1L,       // 5 non-null ids, 4 distinct
      "in_range(v)" -> 2L,      // 200 and -1; null v skipped
      "one_of(color)" -> 1L,    // green
      "matches(name)" -> 1L))   // Dave; null name skipped
  }

  test("multi-column unique counts duplicates among non-null keys") {
    val d2 = Seq(
      (Some(1), Some("a")), (Some(1), Some("a")), (Some(1), Some("b")),
      (None, Some("a")), (None, Some("a"))   // null keys never counted
    ).toDF("k1", "k2")
    val got = check(d2, Seq(Unique(Seq("k1", "k2"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unique(k1,k2)" -> 1L))
  }

  test("holds gates on zero total violations") {
    assert(holds(df, Seq(NotNull("id"))))
    assert(!holds(df, Seq(NotNull("id"), NotNull("name"))))
  }

  test("one aggregation pass: no join in the plan") {
    val plan = check(df, Seq(NotNull("name"), Unique(Seq("id")),
        InRange("v", 0, 100)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected joinless plan:\n$plan")
  }

  test("duplicate rules are rejected") {
    val e = intercept[IllegalArgumentException] {
      check(df, Seq(NotNull("name"), NotNull("name")))
    }
    assert(e.getMessage.contains("duplicate rule"))
  }
}
