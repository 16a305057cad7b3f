package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one `private[sql]` doorway the engine needs: constructing a
  * DataFrame from a hand-built [[LogicalPlan]] (Spark exposes no public
  * API for custom logical nodes — `Dataset.ofRows` is how every
  * extension library does it). Lives in a subpackage of
  * `org.apache.spark.sql` solely to satisfy the access qualifier; no
  * Spark internals are modified.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
