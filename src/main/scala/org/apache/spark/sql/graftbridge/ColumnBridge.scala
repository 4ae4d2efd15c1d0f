package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column ↔ catalyst Expression bridge.
  *
  * Spark 4 hides the Expression-backed Column constructor behind
  * private[sql] (the Column API is now Connect-agnostic). Extension
  * libraries that ship native Catalyst expressions use a same-package
  * shim to reach the classic conversion — the standard pattern for
  * Spark-native plugins.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
