package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.SimHash64Expr

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * graft_simhash64(tokens) ...")` works alongside the Column API.
  *
  * Usage: SparkSession.builder()
  *   .withExtensions(new GraftExtensions) ...
  * or spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64Expr].getName, "graft_simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64Expr(children.head)))
  }
}
