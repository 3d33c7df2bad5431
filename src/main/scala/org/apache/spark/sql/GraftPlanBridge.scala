package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway the engine needs: constructing a
  * DataFrame from a custom [[LogicalPlan]] (`Dataset.ofRows` is
  * package-private). Standard practice for Spark plan extensions that
  * produce leaf nodes outside the SQL parser path.
  */
object GraftPlanBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
