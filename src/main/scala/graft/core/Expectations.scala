package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the row-level sibling of the
  * schema audit ([[Schemas]], reference `jorvik/audit/schemas.py:4-56`):
  * where the reference validates a frame's SHAPE on every ETL boundary
  * (`jorvik/pipelines/etl.py:189-211`), these rules validate its
  * VALUES, returning a violation count per rule so a pipeline can gate
  * a load on `violations == 0` (or log the drift and continue).
  *
  * Scale shape: every rule compiles to a conditional aggregate and ALL
  * rules run in ONE aggregation pass over one scan (uniqueness rules
  * add the standard multi-distinct expand; still no joins, no second
  * scan), then the single result row is unpivoted driver-free by
  * exploding an array of per-rule structs — the [[graft.ops.Profile]]
  * shape. Null semantics: only [[Expectations.NotNull]] counts nulls;
  * range/set/regex rules skip null values (compose with NotNull to
  * forbid them), and uniqueness counts duplicates among fully non-null
  * keys.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** `column` must hold no nulls. */
  case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }

  /** The non-null tuples of `columns` must be distinct; violations =
    * number of surplus rows (total non-null-keyed rows − distinct
    * keys). */
  case class Unique(columns: Seq[String]) extends Rule {
    require(columns.nonEmpty, "unique needs at least one column")
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Non-null values must fall in [lo, hi]; a non-null value that is
    * not numeric at all is a violation too (try_cast, so the check
    * COUNTS dirty data instead of crashing on it under ANSI casts). */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val name = s"in_range($column)"
  }

  /** Non-null values must be one of `allowed`. */
  case class OneOf(column: String, allowed: Seq[String]) extends Rule {
    require(allowed.nonEmpty, "one_of needs at least one allowed value")
    val name = s"one_of($column)"
  }

  /** Non-null values must match `regex` (Java/RE2-portable subset). */
  case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }

  /** Cross-column CHECK constraint: `condition` is any boolean SQL
    * expression over the row (e.g. `"ship_date >= order_date"`).
    * SQL CHECK semantics: only rows where the condition is FALSE
    * violate — a NULL result passes (guard inputs with [[NotNull]] if
    * null must not pass). `label` is the display name. */
  case class Satisfies(label: String, condition: String) extends Rule {
    require(label.nonEmpty, "satisfies needs a label")
    val name = s"satisfies($label)"
  }

  private def violationCount(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, lit(1)))
    case Unique(cs) =>
      count(when(cs.map(col(_).isNotNull).reduce(_ && _), lit(1))) -
        countDistinct(col(cs.head), cs.tail.map(col): _*)
    case InRange(c, lo, hi) =>
      // try_cast + coalesce(false): an unparseable non-null value is a
      // VIOLATION, not a query-killing ANSI cast error
      count(when(col(c).isNotNull &&
        !coalesce(col(c).try_cast("double").between(lo, hi),
          lit(false)), lit(1)))
    case OneOf(c, allowed) =>
      count(when(col(c).isNotNull && !col(c).isin(allowed: _*), lit(1)))
    case Matches(c, re) =>
      count(when(col(c).isNotNull && !col(c).rlike(re), lit(1)))
    case Satisfies(_, cond) =>
      // NOT(null) is null, so a null condition falls out of the WHEN —
      // exactly SQL CHECK's null-passes rule
      count(when(!expr(cond), lit(1)))
  }

  /** Rule display names, with repeats disambiguated by a #i suffix
    * (two regex rules on one column are legitimate; output rows must
    * still be distinguishable). */
  private def displayNames(rules: Seq[Rule]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    rules.map { r =>
      val n = seen.updateWith(r.name)(c => Some(c.getOrElse(0) + 1)).get
      if (n == 1) r.name else s"${r.name}#$n"
    }
  }

  /** Evaluate every rule in one pass; returns (rule, violations) with
    * one row per rule, in the given rule order-insensitive form (sort
    * on `rule` for a stable report). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val names = displayNames(rules)
    // positional scratch aliases: a rule's display name may hold dots
    // or parens that col() would parse as nested-field syntax
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      violationCount(r).as(s"__v_$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.zipWithIndex.map { case (n, i) => struct(
        lit(n).as("rule"),
        col(s"__v_$i").as("violations")) }: _*)).as("p"))
      .select("p.*")
  }

  /** True iff every rule passes — the boolean gate form for
    * `smokeTestEtl`-style checks. One job. */
  def holds(df: DataFrame, rules: Seq[Rule]): Boolean =
    check(df, rules).agg(sum(col("violations")).as("v"))
      .head().getLong(0) == 0L

  /** Referential containment (the dbt "relationships" test): counts
    * rows of `df` whose non-null `fkCol` has no match in `dim.pkCol`.
    * Kept OUT of [[check]] because it needs a join — it can't share
    * the rules' single aggregation pass; union the one-row results
    * instead. Null foreign keys are skipped (compose with NotNull);
    * null dimension keys match nothing.
    *
    * Scale shape: one left-anti equi-join (broadcast when the
    * dimension is small — the usual FK audit) feeding a single count;
    * nothing is collected. Output: one (rule, violations) row. */
  def checkReferential(df: DataFrame, fkCol: String, dim: DataFrame,
                       pkCol: String, dimName: String): DataFrame = {
    val orphans = df.filter(col(fkCol).isNotNull)
      .join(dim.filter(col(pkCol).isNotNull)
        .select(col(pkCol).as("__pk")).distinct(),
        col(fkCol) === col("__pk"), "left_anti")
    orphans.agg(count(lit(1)).as("violations"))
      .select(lit(s"referential($fkCol->$dimName.$pkCol)").as("rule"),
        col("violations"))
  }
}
