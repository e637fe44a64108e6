package graft.lineage

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** A parsed node of a formatted physical plan.
  * Reference: jorvik/data_lineage/execution_plan.py:11-53. */
class ExecutionNode(val id: Int, val name: String, val height: Int,
                    var properties: Map[String, String] = Map.empty) {
  val children: ListBuffer[ExecutionNode] = ListBuffer.empty

  def addChild(node: ExecutionNode): Unit = children += node

  /** All leaf nodes under (and including) this node. */
  def leaves: Seq[ExecutionNode] =
    if (children.isEmpty) Seq(this)
    else children.toSeq.flatMap(_.leaves)

  def treeLines(level: Int = 0, printProperties: Boolean = false): Seq[String] = {
    val self = ("  " * level) + s"$name ($id)"
    val props =
      if (printProperties)
        properties.map { case (k, v) => ("  " * (level + 1)) + s"$k: $v" }.toSeq
      else Nil
    Seq(self) ++ props ++ children.flatMap(_.treeLines(level + 1, printProperties))
  }
}

/** Text-level parser for `df.explain("formatted")` output, kept for API
  * parity with the reference (jorvik/data_lineage/execution_plan.py).
  * The engine's own lineage path uses the native plan walk in
  * [[PlanWalk]] instead — same tree, zero parsing.
  */
object ExecutionPlan {

  /** The JVM-native equivalent of the reference's stdout capture
    * (execution_plan.py:56-71): ask Catalyst for the formatted string
    * directly. Forces analysis + physical planning, no execution. */
  def captureExplain(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Split into (plan section, node details section)
    * (execution_plan.py:73-78). */
  def splitFormattedExplain(explainResult: String): (String, String) = {
    val parts = explainResult.split("\n\n\n")
    (parts(0), if (parts.length > 1) parts(1) else "")
  }

  /** Parse the node-details section to id → {key: value}
    * (execution_plan.py:82-102). */
  def parseNodeDetails(nodeDetails: String): Map[Int, Map[String, String]] =
    nodeDetails.split("\n\n").filter(_.trim.nonEmpty).flatMap { nodeText =>
      val lines = nodeText.split("\n")
      val idToken = lines(0).split(" ")(0).replace("(", "").replace(")", "")
      idToken.toIntOption.map { nodeId =>
        val info = lines.drop(1)
          // A '+-' line marks a nested plan (cached df) — stop there.
          .takeWhile(!_.startsWith("+-"))
          .flatMap { line =>
            line.split(":", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim)
              case _ => None
            }
          }.toMap
        nodeId -> info
      }
    }.toMap

  private val sectionHeader = """^\s*==\s*[^=]+\s*==\s*$""".r

  def isSectionHeader(line: String): Boolean =
    sectionHeader.matches(line)

  def cleanIndentationMarkers(line: String): String =
    line.replaceAll("[+\\-:]", " ")

  def getIndentationLevel(line: String, nSpaces: Int = 3): Int =
    (line.length - line.replaceAll("^\\s+", "").length) / nSpaces

  private val idPattern = """\((\d+)\)""".r
  private val namePattern = """[a-zA-Z0-9][a-zA-Z0-9\s]*?(?=\s*\()""".r

  /** `'* ShuffleQueryStage (11), Statistics(…)'` → (11, ShuffleQueryStage)
    * (execution_plan.py:126-136). */
  def parseNode(line: String): (Option[Int], Option[String]) = {
    val id = idPattern.findFirstMatchIn(line).map(_.group(1).toInt)
    val name = namePattern.findFirstIn(line).map(_.trim)
    (id, name)
  }

  /** Build the node tree from a formatted explain transcript; indentation
    * (÷3) gives parent-child structure (execution_plan.py:139-180). */
  def buildExecutionTree(explainResult: String): ExecutionNode = {
    val (planSection, nodeDetails) = splitFormattedExplain(explainResult)
    val details = parseNodeDetails(nodeDetails)
    val flatNodes = planSection.split("\n").toSeq
      .map(cleanIndentationMarkers)
      .filterNot(isSectionHeader)
      .flatMap { line =>
        val indentation = getIndentationLevel(line)
        parseNode(line) match {
          case (Some(id), Some(name)) =>
            Some(new ExecutionNode(id, name, indentation))
          case _ => None
        }
      }

    var root: ExecutionNode = null
    val stack = ListBuffer.empty[ExecutionNode]
    flatNodes.foreach { node =>
      node.properties = details.getOrElse(node.id, Map.empty)
      while (stack.nonEmpty && stack.last.height >= node.height)
        stack.remove(stack.length - 1)
      if (stack.nonEmpty) stack.last.addChild(node)
      else if (root != null)
        throw new IllegalArgumentException(
          s"Execution graph contains multiple roots: ${root.name} and ${node.name}")
      else root = node
      stack += node
    }
    root
  }
}
