package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned `private[sql]` crossing: build a DataFrame from a
  * programmatically-constructed logical plan (Spark exposes no public
  * API for planting a custom `LogicalPlan` node — `Dataset.ofRows` is
  * how every internal operator does it). Used by
  * [[graft.plans.AsOfJoinNative]] to plant its `AsOfJoinNode`. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
