package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]. Spark's own
  * `Dataset.ofRows` is package-private to `org.apache.spark.sql`, so this
  * bridge lives in a nested package — the standard wiring for libraries
  * that add whole-plan operators (the same access route Spark's own
  * connectors use). Nothing else in graft reaches into Spark internals
  * this way.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
