package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** `Dataset.ofRows` is private[sql]; the Pinot dialect entry point needs
  * it to execute an AST-rewritten plan directly (no way to print a
  * LogicalPlan back to SQL text). Same package-placement discipline as
  * the other org.apache.spark.sql.graft bridges. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
