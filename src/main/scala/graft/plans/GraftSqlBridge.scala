package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access bridge: `classic.Dataset.ofRows` is `private[sql]`, and
  * building a DataFrame from a custom logical node (graft's
  * TopKPerGroupPlan) has no public constructor — the standard extension
  * escape hatch is a one-liner in the `org.apache.spark.sql` package. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
