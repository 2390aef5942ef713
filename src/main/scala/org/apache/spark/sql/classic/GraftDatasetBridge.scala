package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is private[sql]; this is the minimal public bridge
  * for building a DataFrame from a custom LogicalPlan (the standard
  * extension-library technique when not going through a registered
  * SQL function). */
object GraftDatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
