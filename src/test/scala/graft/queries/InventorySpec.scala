package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the exhaustive query contract — this spec keeps it
  * that way mechanically (round-5 verdict: ~10 declared queries had
  * drifted in with no §2 row; the prose claim "the §2 inventory is the
  * contract" had silently stopped being true). Set-compare both ways:
  * every declared query name must appear in the §2 section text, and
  * every `q_*` token §2 mentions must be a declared query. No Spark
  * session needed — pure text vs the registry.
  */
class InventorySpec extends AnyFunSuite {

  private lazy val survey = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try src.mkString finally src.close()
  }

  /** §2 body: from the "## 2." heading to the next top-level "## " one. */
  private lazy val section2: String = {
    val lines = survey.linesIterator.toVector
    val start = lines.indexWhere(l => l.startsWith("## 2"))
    assert(start >= 0, "SURVEY.md has no '## 2' section")
    val end = lines.indexWhere(
      l => l.startsWith("## ") && !l.startsWith("## 2"), start + 1)
    lines.slice(start, if (end < 0) lines.size else end).mkString("\n")
  }

  private lazy val declared: Set[String] = graft.SparkEntry.queries.keySet

  private lazy val mentioned: Set[String] =
    raw"q_[a-z0-9_]+".r.findAllIn(section2).toSet

  test("every declared query is inventoried in SURVEY.md section 2") {
    val missing = declared.filter(_.startsWith("q_")) -- mentioned
    assert(missing.isEmpty,
      s"declared queries absent from SURVEY §2 (add their rows): " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every q_* token SURVEY.md section 2 mentions is a declared query") {
    val ghosts = mentioned -- declared
    assert(ghosts.isEmpty,
      s"SURVEY §2 names queries that are not declared (stale rows?): " +
        ghosts.toSeq.sorted.mkString(", "))
  }

  test("non-q_-named declared queries are also inventoried") {
    val others = declared.filterNot(_.startsWith("q_"))
    val absent = others.filterNot(section2.contains)
    assert(absent.isEmpty,
      s"declared queries absent from SURVEY §2: ${absent.toSeq.sorted.mkString(", ")}")
  }
}
