package org.apache.spark.sql.classic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the plan-tier extension needs: turning a
  * hand-built [[LogicalPlan]] back into a user-facing [[DataFrame]].
  * `Dataset.ofRows` is package-private to `org.apache.spark.sql`, so
  * this shim lives in the `classic` package — the standard pattern for
  * Spark-native libraries that add logical operators (delta/qbeast-
  * style). Nothing else in the repo reaches into Spark internals. */
object GraftPlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
