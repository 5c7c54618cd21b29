package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Catalyst Expression
  * conversion (Spark 4 moved `Column.expr` behind the Connect-compatible
  * ColumnNode API). Lives under `org.apache.spark.sql` for access — the
  * standard extension-library pattern.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
