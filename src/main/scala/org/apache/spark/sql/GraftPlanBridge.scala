package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the package-private `classic.Dataset.ofRows`:
  * public Spark offers no API for constructing a DataFrame over a
  * third-party LOGICAL plan node (extensions can inject strategies to
  * LOWER such a node, but something must first build a Dataset around
  * it). This is the conventional one-liner every Catalyst-extension
  * library ships; it touches no internals beyond the constructor call.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
