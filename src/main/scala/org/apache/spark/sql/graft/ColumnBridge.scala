package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's `Column` wraps a ColumnNode; the Expression bridge
  * (`ExpressionUtils`) is `private[sql]`. This shim — the standard pattern
  * for third-party Spark extension libraries shipping custom Catalyst
  * expressions — re-exports just the two conversions the engine needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
