package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library access to Dataset.ofRows (private[sql]) — the standard
  * extension-library pattern for turning a custom LogicalPlan into a
  * DataFrame on the classic (non-Connect) runtime.
  */
object GraftSqlAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
