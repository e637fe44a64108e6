package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec,
  RDDScanExec, RowDataSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** The data source feeding one scan leaf of a physical plan.
  * Reference: jorvik/data_lineage/node_handler.py:41-49. */
case class SparkScanDataSource(scanType: String, location: String)

/** Native physical-plan walk — the engine's replacement for the
  * reference's explain-text parsing (SURVEY.md §7 module 6): work on the
  * real `SparkPlan` tree, unwrap AQE wrappers explicitly, classify scan
  * leaves by exec-node class instead of string-matching node names.
  */
object PlanWalk {

  /** Scan leaves of the executed plan, seen through AQE / reused-exchange /
    * cache wrappers. (The reference instead drops `AdaptiveSparkPlan`
    * leaves it cannot see into — observer.py:56-59; here we recurse into
    * the nested plan, including cached sub-plans.) */
  def scanLeaves(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => scanLeaves(a.executedPlan)
    case q: QueryStageExec => scanLeaves(q.plan)
    case r: ReusedExchangeExec => scanLeaves(r.child)
    case i: InMemoryTableScanExec => scanLeaves(i.relation.cachedPlan)
    case p if p.children.isEmpty => Seq(p)
    case p => p.children.flatMap(scanLeaves)
  }

  /** Classify one scan leaf. Mirrors node_handler.py:49-69:
    * file scans → rootPaths (exact — no truncated-string parsing needed),
    * local/RDD scans → memory_scan, JDBC row sources → jdbc_scan. */
  def extractDataSource(leaf: SparkPlan): SparkScanDataSource = leaf match {
    case f: FileSourceScanExec =>
      SparkScanDataSource("file_scan",
        f.relation.location.rootPaths.mkString(", "))
    case b: BatchScanExec =>
      b.scan match {
        case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
          SparkScanDataSource("file_scan", fs.fileIndex.rootPaths.mkString(", "))
        case other =>
          SparkScanDataSource("v2_scan", other.getClass.getSimpleName)
      }
    case _: LocalTableScanExec =>
      SparkScanDataSource("memory_scan", "LocalTableScan")
    case _: RDDScanExec =>
      SparkScanDataSource("memory_scan", "Scan ExistingRDD")
    case r: RowDataSourceScanExec =>
      // jdbc relations surface here; keep the pushed-query text
      // (node_handler.py:63-67 parses it out of the node name).
      SparkScanDataSource("jdbc_scan", r.relation.toString)
    case other =>
      SparkScanDataSource("unknown_scan", other.nodeName)
  }

  /** All data sources of a DataFrame's physical plan. */
  def dataSources(df: DataFrame): Seq[String] =
    scanLeaves(df.queryExecution.executedPlan).map { leaf =>
      val ds = extractDataSource(leaf)
      if (ds.scanType == "file_scan") ds.location
      else s"${ds.scanType}: ${ds.location}"
    }
}
