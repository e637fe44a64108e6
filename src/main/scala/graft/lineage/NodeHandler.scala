package graft.lineage

/** Text-level scan classification for parsed [[ExecutionNode]]s — API
  * parity with jorvik/data_lineage/node_handler.py. The engine's own
  * lineage path classifies real exec nodes ([[PlanWalk]]); this handler
  * exists for the explain-transcript route (e.g. plans captured from
  * other systems).
  */
object NodeHandler {

  /** node_handler.py:11-12 */
  val FileBasedScans: Seq[String] = Seq(
    "Scan delta", "Scan parquet", "Scan orc", "Scan avro", "Scan csv",
    "Scan json", "Scan text", "Scan xml", "Scan binaryFile")

  /** node_handler.py:15 */
  val MemoryScans: Seq[String] = Seq("Scan ExistingRDD", "LocalTableScan")

  private val bracket = """\[([^\[\]]+)\]""".r

  /** Content inside the first [brackets] (node_handler.py:17-20). */
  def extractFirstBracketContent(s: String): Option[String] =
    bracket.findFirstMatchIn(s).map(_.group(1))

  private val truncated = """, \.\.\. \d+ entries""".r

  /** Strip ", ... N entries" truncation + partition/file suffixes:
    * `/mnt/raw/bookings/date_part=2024-07-02, ... 13 entries` →
    * `/mnt/raw/bookings` (node_handler.py:22-38). */
  def handleTruncatedPath(path: String): String =
    if (truncated.findFirstIn(path).isDefined) {
      val beforeEq = path.split("=")(0)
      beforeEq.substring(0, math.max(beforeEq.lastIndexOf('/'), 0))
    } else path

  /** Classify a parsed node into (scan_type, location)
    * (node_handler.py:49-69). */
  def extractDataSource(node: ExecutionNode): SparkScanDataSource = {
    if (FileBasedScans.contains(node.name)) {
      val location = node.properties.get("Location")
        .flatMap(extractFirstBracketContent)
        .map(handleTruncatedPath)
        .orNull
      SparkScanDataSource("file_scan", location)
    } else if (MemoryScans.contains(node.name)) {
      SparkScanDataSource("memory_scan", node.name)
    } else if (node.name.contains("Scan JDBCRelation")) {
      // 'Scan JDBCRelation((select …) SPARK_GEN_SUBQ_0) [numPartitions=1]'
      val location = node.name.split("JDBCRelation\\(\\(")(1)
        .split("\\) SPARK_GEN_SUBQ")(0)
      SparkScanDataSource("jdbc_scan", location)
    } else {
      SparkScanDataSource("unknown_scan", node.name)
    }
  }
}
