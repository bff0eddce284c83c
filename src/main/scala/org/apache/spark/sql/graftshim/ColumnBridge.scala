package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr` / `new Column(expr)` from the public API
  * (Column now wraps a ColumnNode); the supported conversions live in
  * `private[sql]` ExpressionUtils. This shim sits inside the sql package
  * namespace to re-expose exactly those two conversions for graft's custom
  * Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Same-package bridge for turning an optimized/transformed LogicalPlan
  * back into a DataFrame (`Dataset.ofRows` is private[sql]) — used by plan
  * tests to execute the output of a standalone optimizer rule. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.classic.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
}
