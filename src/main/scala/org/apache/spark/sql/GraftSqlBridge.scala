package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Main-code twin of the test-side GraftPlanProbe: the one
  * private[sql] door the engine needs — materializing a DataFrame
  * from a hand-built LogicalPlan (the same call Spark's own DSL
  * methods bottom out in). Used by graft.plans.AsOfJoins to surface
  * the native as-of join node.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
