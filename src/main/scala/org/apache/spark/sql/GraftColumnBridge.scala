package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  * Spark 4 routes Column through ColumnNode and keeps the conversion
  * helpers `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`),
  * so third-party expressions need this one-hop shim — the standard pattern
  * for Spark extension libraries (same access trick Spark connectors use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
