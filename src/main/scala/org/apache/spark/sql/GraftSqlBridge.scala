package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the classic Dataset factory (`private[sql]`) so graft can
  * materialize DataFrames from its own LogicalPlan nodes
  * (graft.plans.TopKPerGroup). This is the standard extension-point
  * pattern for libraries that add operators below the public DataFrame
  * API: everything referenced is public Spark binary, only the package
  * placement grants access.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
