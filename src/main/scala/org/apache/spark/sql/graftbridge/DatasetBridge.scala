package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 keeps `Dataset.ofRows` `private[sql]`; the store's hot-tail
  * fast path needs it to re-wrap an already-optimized [[LogicalPlan]]
  * (a materialized `LocalRelation`) as a DataFrame WITHOUT a round
  * trip through external rows. Same access-shim pattern as
  * [[ColumnBridge]].
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
