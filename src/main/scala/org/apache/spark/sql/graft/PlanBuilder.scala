package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one private[sql] doorway the custom-operator layer needs:
  * building a DataFrame from a hand-constructed logical plan (the same
  * entry every first-party DataFrame API call uses). Kept to a single
  * forwarding method in a dedicated package so the boundary is explicit.
  */
object PlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
