package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's private[sql] Column ↔ Expression converters,
  * needed to expose custom Catalyst expressions (e.g. graft.functions.
  * SimHash64Expr) through the public Column API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
