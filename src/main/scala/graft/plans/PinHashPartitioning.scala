package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Re-asserts the two facts `Dataset.localCheckpoint`/`checkpoint`
  * drop under AQE (both measured on Spark 4.1.2):
  *
  *  1. **Size.** The checkpointed `LogicalRDD` reports the session
  *     default sizeInBytes (effectively "huge"), so the planner can
  *     never STATICALLY broadcast a snapshot — every join against one
  *     is planned as a shuffle join and only rescued by AQE at run
  *     time, paying the exchange + re-plan jobs. `sizeBytes` carries
  *     the frame's TRUE materialized size read from the block manager
  *     (the snapshot is eager, so the blocks exist when the snapshot
  *     returns), restoring static broadcast selection for small
  *     frames. The measured (deserialized) size over-estimates the
  *     serialized size Spark's thresholds assume, so the bias is
  *     toward LESS broadcasting — never an OOM source.
  *
  *  2. **Layout** (only when `keys` is non-empty). The checkpoint
  *     records `UnknownPartitioning(0)` (the outputPartitioning is
  *     read off the not-yet-finalized `AdaptiveSparkPlanExec`), so a
  *     bounded-round graph loop re-exchanges its label frame every
  *     round. `HashPartitioning(keys, numPartitions)` restores the
  *     layout fact — at 100 TB the difference between an iterative
  *     algorithm whose per-round cost is one message shuffle, and one
  *     that also re-shuffles the whole vertex frame per round.
  *
  * SOUNDNESS CONTRACT (why only [[graft.sources.Staging]] constructs
  * this): the layout claim is only true when the child's physical
  * layout is exactly `HashPartitioning(keys, numPartitions)` — which
  * `Staging.snapshotKeyed` guarantees by checkpointing
  * `df.repartition(numPartitions, keys)`: an explicit-count
  * repartition is never AQE-coalesced (REPARTITION_BY_NUM), and
  * checkpoint preserves partitions block-for-block. Pinning any other
  * frame (e.g. a groupBy output, which AQE may have coalesced into
  * range-of-bucket partitions) would silently mis-join; a false claim
  * cannot be detected at run time. The size claim is always sound —
  * it is a measurement.
  *
  * `keys` are Attribute fields, so `QueryPlan.expressions` picks them
  * up and `references` includes them — column pruning then KEEPS the
  * key columns when it pushes a Project below this node (a Project
  * under the pin is fine: projection never moves rows between
  * partitions).
  */
case class SnapshotFacts(keys: Seq[Attribute], numPartitions: Int,
                         sizeBytes: Option[BigInt],
                         child: LogicalPlan) extends UnaryNode {
  require(keys.isEmpty || numPartitions > 0,
    "SnapshotFacts: a layout claim needs a positive partition count")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override def stats: Statistics =
    sizeBytes.map(s => Statistics(sizeInBytes = s.max(1))).getOrElse(child.stats)
  override protected def withNewChildInternal(newChild: LogicalPlan): SnapshotFacts =
    copy(child = newChild)
}

/** Physical form: a zero-cost pass-through (returns the child's RDD
  * unchanged — no per-row work, not even a map) that reports the
  * pinned partitioning. Sits directly above the checkpoint scan
  * (`Scan ExistingRDD`), which is a codegen input boundary anyway, so
  * not participating in whole-stage codegen costs nothing. */
case class SnapshotFactsExec(keys: Seq[Attribute], numPartitions: Int,
                             child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning =
    if (keys.isEmpty) child.outputPartitioning
    else HashPartitioning(keys, numPartitions)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(newChild: SparkPlan): SnapshotFactsExec =
    copy(child = newChild)
}

/** Plans [[SnapshotFacts]]; registered via [[GraftExtensions]]. */
class PinPartitioningStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SnapshotFacts(keys, n, _, child) =>
      SnapshotFactsExec(keys, n, planLater(child)) :: Nil
    case _ => Nil
  }
}
