package graft.core

import org.apache.spark.sql.functions.col
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

  test("same-named rules are disambiguated, not rejected") {
    // two independent format constraints on one column are legitimate
    val got = check(df, Seq(
        Matches("name", "^[a-zA-Z]+$"), Matches("name", "^.{4,}$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "matches(name)" -> 0L,    // all four non-null names alphabetic
      "matches(name)#2" -> 1L)) // "bob" is only 3 chars
  }

  test("in_range counts unparseable strings instead of ANSI-crashing") {
    val d2 = Seq(("1", "10"), ("2", "N/A"), ("3", null), ("4", "250"))
      .toDF("id", "amount")
    val got = check(d2, Seq(InRange("amount", 0, 100)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "N/A" unparseable → violation; 250 out of range; null skipped
    assert(got == Map("in_range(amount)" -> 2L))
  }

  test("satisfies: CHECK semantics — FALSE violates, NULL passes") {
    val d2 = Seq((Some(1), Some(2)), (Some(5), Some(3)), (None, Some(1)))
      .toDF("a", "b")
    val got = check(d2, Seq(Satisfies("a_lt_b", "a < b")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // (5,3) violates; (null,1) evaluates NULL → passes per SQL CHECK
    assert(got == Map("satisfies(a_lt_b)" -> 1L))
  }

  test("checkReferential counts orphans; null fks and dim keys ignored") {
    val facts = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val dim = Seq(Some(10L), Some(20L), None).toDF("pk")
    val got = checkReferential(facts, "fk", dim, "pk", "dim")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 99 is an orphan; the null fk is skipped; the null pk matches nothing
    assert(got == Map("referential(fk->dim.pk)" -> 1L))
  }

  test("rules on nested fields work despite dots in display names") {
    val d2 = Seq((1L, ("x", 5.0)), (2L, (null: String, -1.0)))
      .toDF("id", "meta")
      .select(col("id"), col("meta._1").as("tag"), col("meta"))
    val got = check(d2, Seq(
        NotNull("meta._1"), InRange("meta._2", 0, 10)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null(meta._1)" -> 1L, "in_range(meta._2)" -> 1L))
  }
}
