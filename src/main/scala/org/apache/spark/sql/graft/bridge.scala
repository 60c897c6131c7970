package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 made `new Column(expr)` / `col.expr` private[sql]
  * (ExpressionUtils in the classic module). Compiling this two-liner
  * inside the org.apache.spark.sql namespace is the established pattern
  * for Spark-extension libraries that construct native expressions
  * without requiring every session to carry SparkSessionExtensions —
  * the graft native functions stay usable from ANY SparkSession, while
  * GraftExtensions additionally registers them for SQL.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — `Dataset.ofRows` went
    * private[sql] with the classic/connect split; custom logical nodes
    * (e.g. the native as-of join) need it to hand their plan back to the
    * session. */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
