package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column ↔ Catalyst Expression
  * conversion (Spark 4 moved `Column.expr` behind the Connect-compatible
  * ColumnNode API). Lives under `org.apache.spark.sql` for access — the
  * standard extension-library pattern.
  */
object ColumnBridge {
  /** Lazy wrapper — fine when the result goes back through DataFrame APIs
    * that convert ColumnNodes during analysis.
    */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager, full conversion of the ColumnNode tree to Catalyst — required
    * when the expression is handed to paths that never see the converter
    * (e.g. FunctionRegistry builders for SQL functions).
    */
  def expressionEager(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** Bridge into `Dataset.ofRows` (private[sql] in Spark 4) so the engine's
  * custom logical operators ([[graft.plans]]) can be wrapped back into a
  * user-facing DataFrame.
  */
object DatasetBridge {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
