package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the Column internals
  * behind `private[sql]` (columns now wrap ColumnNodes); building a
  * Column from a custom Catalyst Expression goes through
  * `classic.ExpressionUtils`, which is only visible from inside the
  * `org.apache.spark.sql` package tree — hence this one-file shim
  * (the established extension-library pattern for Spark 4). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** LogicalPlan → DataFrame bridge for custom whole-operator nodes
  * (same rationale as [[ColumnBridge]]: `Dataset.ofRows` lives behind
  * `private[sql]` in the classic implementation). */
object PlanBridge {
  def dataset(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
