package graft.lineage

import org.scalatest.funsuite.AnyFunSuite

/** Ports of test/data_lineage/test_node_handler.py. */
class NodeHandlerSpec extends AnyFunSuite {

  test("file scan: bracket content extracted, location resolved") {
    val node = new ExecutionNode(1, "Scan parquet", 7,
      Map("Location" -> "PreparedDeltaFileIndex [dbfs:/mnt/bronze/adventure_works/sales/data]"))
    val ds = NodeHandler.extractDataSource(node)
    assert(ds.scanType == "file_scan")
    assert(ds.location == "dbfs:/mnt/bronze/adventure_works/sales/data")
  }

  test("truncated path: partition and file suffix stripped") {
    assert(NodeHandler.handleTruncatedPath(
      "/mnt/blob_storage/cleansed/sales_data/date_part=2024-07-20, ... 13 entries") ==
      "/mnt/blob_storage/cleansed/sales_data")
    assert(NodeHandler.handleTruncatedPath(
      "/mnt/blob_storage/cleansed/customer_info/part-00000-tid-751.snappy.orc, ... 12 entries") ==
      "/mnt/blob_storage/cleansed/customer_info")
    assert(NodeHandler.handleTruncatedPath("/mnt/plain/path") == "/mnt/plain/path")
  }

  test("memory scan") {
    val ds = NodeHandler.extractDataSource(
      new ExecutionNode(6, "Scan ExistingRDD", 6))
    assert(ds == SparkScanDataSource("memory_scan", "Scan ExistingRDD"))
    val ds2 = NodeHandler.extractDataSource(
      new ExecutionNode(7, "LocalTableScan", 6))
    assert(ds2 == SparkScanDataSource("memory_scan", "LocalTableScan"))
  }

  test("jdbc scan: pushed SQL extracted (reference test_node_handler.py:32-35)") {
    val node = new ExecutionNode(3,
      "Scan JDBCRelation((select * from SALES_TABLE) SPARK_GEN_SUBQ_0) [numPartitions=1]", 1)
    val ds = NodeHandler.extractDataSource(node)
    assert(ds.scanType == "jdbc_scan")
    assert(ds.location == "select * from SALES_TABLE")
  }
}
