package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression conversion is `private[sql]` in Spark 4
  * (`classic.ExpressionUtils`); this one-file bridge re-exports it for
  * graft's native expressions — the conventional pattern for libraries
  * that build typed Column APIs over custom Catalyst expressions
  * without registering session-scoped SQL functions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom logical plan (`Dataset.ofRows` is
    * `private[sql]`) — what lets graft's native operators (AsOfJoin)
    * return ordinary DataFrames. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
