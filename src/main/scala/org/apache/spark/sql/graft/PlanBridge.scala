package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.{DataFrame, Row}

/** `private[sql]` bridge (the standard extension-library shim — the
  * same door Delta/Iceberg/Hudi open): build a DataFrame from a raw
  * [[LogicalPlan]], and read one back. Needed by
  * [[graft.sources.Staging.snapshotKeyed]] to wrap a checkpointed
  * frame in [[graft.plans.PinHashPartitioning]] — there is no public
  * Dataset API that attaches a custom logical node. Nothing else in
  * the repo goes through this package. */
object PlanBridge {

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[Row]].logicalPlan

  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(df.sparkSession.asInstanceOf[CSparkSession], plan)
}
