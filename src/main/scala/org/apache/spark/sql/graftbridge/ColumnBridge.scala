package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column <-> catalyst Expression bridge behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * This package-located shim re-exposes exactly the two conversions a
  * library defining native Catalyst expressions needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
