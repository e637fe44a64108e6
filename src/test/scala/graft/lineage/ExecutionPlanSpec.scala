package graft.lineage

import org.scalatest.funsuite.AnyFunSuite

/** Golden-transcript parser tests — ports of
  * test/data_lineage/test_execution_plan.py over the frozen explain
  * fixture (test/fixtures/data_lineage.py:23-90). */
class ExecutionPlanSpec extends AnyFunSuite {

  // Abbreviated form of the reference fixture: same 12-node tree shape,
  // same section layout, detail keys reduced to the ones the parser and
  // node handler read.
  private val explainResult =
    """== Physical Plan ==
      |AdaptiveSparkPlan (12)
      |+- == Initial Plan ==
      |   Project (11)
      |   +- SortMergeJoin LeftOuter (10)
      |      :- Sort (5)
      |      :  +- Exchange (4)
      |      :     +- Project (3)
      |      :        +- Filter (2)
      |      :           +- Scan parquet  (1)
      |      +- Sort (9)
      |         +- Exchange (8)
      |            +- Filter (7)
      |               +- Scan ExistingRDD (6)
      |
      |
      |(1) Scan parquet
      |Output [2]: [SalesTerritoryKey#21, Sales#24]
      |Batched: true
      |Location: PreparedDeltaFileIndex [dbfs:/mnt/bronze/adventure_works/sales/data]
      |ReadSchema: struct<SalesTerritoryKey:int,Sales:string>
      |
      |(2) Filter
      |Input [2]: [SalesTerritoryKey#21, Sales#24]
      |Condition : isnotnull(SalesTerritoryKey#21)
      |
      |(3) Project
      |Output [2]: [SalesTerritoryKey#21, Sales#24]
      |
      |(4) Exchange
      |Arguments: hashpartitioning(cast(SalesTerritoryKey#21 as bigint), 200), ENSURE_REQUIREMENTS, [plan_id=236]
      |
      |(5) Sort
      |Arguments: [cast(SalesTerritoryKey#21 as bigint) ASC NULLS FIRST], false, 0
      |
      |(6) Scan ExistingRDD
      |Output [2]: [SalesTerritoryKey#36L, region_name#37]
      |Arguments: [SalesTerritoryKey#36L, region_name#37], MapPartitionsRDD[4], ExistingRDD, UnknownPartitioning(0)
      |
      |(7) Filter
      |Condition : isnotnull(SalesTerritoryKey#36L)
      |
      |(8) Exchange
      |Arguments: hashpartitioning(SalesTerritoryKey#36L, 200), ENSURE_REQUIREMENTS, [plan_id=237]
      |
      |(9) Sort
      |Arguments: [SalesTerritoryKey#36L ASC NULLS FIRST], false, 0
      |
      |(10) SortMergeJoin
      |Join type: LeftOuter
      |Join condition: None
      |
      |(11) Project
      |Output [3]: [SalesTerritoryKey#21, Sales#24, region_name#37]
      |
      |(12) AdaptiveSparkPlan
      |Output [3]: [SalesTerritoryKey#21, Sales#24, region_name#37]
      |Arguments: isFinalPlan=false
      |""".stripMargin

  test("section headers recognized") {
    assert(ExecutionPlan.isSectionHeader("== Physical Plan =="))
    assert(ExecutionPlan.isSectionHeader("   == Initial Plan ==   "))
    assert(!ExecutionPlan.isSectionHeader("(5) Filter"))
    assert(!ExecutionPlan.isSectionHeader(""))
  }

  test("indentation markers cleaned") {
    assert(ExecutionPlan.cleanIndentationMarkers("      :     +- Project (8)") ==
      "               Project (8)")
  }

  test("indentation level") {
    assert(ExecutionPlan.getIndentationLevel("               Project (8)") == 5)
  }

  test("parse node id and name") {
    val (id, name) = ExecutionPlan.parseNode(
      "* ShuffleQueryStage (11), Statistics(sizeInBytes=1669.9 MiB)")
    assert(id.contains(11))
    assert(name.contains("ShuffleQueryStage"))
  }

  test("parse full plan: 12 nodes with expected (id, name, height)") {
    val expected = Set(
      (1, "Scan parquet", 7), (2, "Filter", 6), (3, "Project", 5),
      (4, "Exchange", 4), (5, "Sort", 3), (6, "Scan ExistingRDD", 6),
      (7, "Filter", 5), (8, "Exchange", 4), (9, "Sort", 3),
      (10, "SortMergeJoin LeftOuter", 2), (11, "Project", 1),
      (12, "AdaptiveSparkPlan", 0))
    val root = ExecutionPlan.buildExecutionTree(explainResult)
    def flatten(n: ExecutionNode): Seq[ExecutionNode] =
      n +: n.children.toSeq.flatMap(flatten)
    val got = flatten(root).map(n => (n.id, n.name, n.height)).toSet
    assert(got == expected)
  }

  test("tree structure: root and single child") {
    val root = ExecutionPlan.buildExecutionTree(explainResult)
    assert(root.id == 12 && root.name == "AdaptiveSparkPlan" && root.height == 0)
    assert(root.children.length == 1)
    assert(root.children.head.id == 11 && root.children.head.name == "Project")
  }

  test("leaves are the two scans") {
    val root = ExecutionPlan.buildExecutionTree(explainResult)
    assert(root.leaves.map(_.id).toSet == Set(1, 6))
  }

  test("node details attached (Location reaches the scan node)") {
    val root = ExecutionPlan.buildExecutionTree(explainResult)
    val scan = root.leaves.find(_.id == 1).get
    assert(scan.properties("Location") ==
      "PreparedDeltaFileIndex [dbfs:/mnt/bronze/adventure_works/sales/data]")
  }

  test("multiple roots rejected") {
    val bad = "== Physical Plan ==\nA (1)\nB (2)\n\n\n(1) A\n\n(2) B\n"
    intercept[IllegalArgumentException] {
      ExecutionPlan.buildExecutionTree(bad)
    }
  }
}
