package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to the Dataset constructor so graft's custom logical
  * operators (e.g. TopKPerKey) can surface as DataFrames. Lives in
  * org.apache.spark.sql by design — the standard extension-jar
  * technique; nothing else from the private surface is touched. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Resolve a user-facing Column to its catalyst Expression. */
  def expression(spark: SparkSession, c: Column): catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
