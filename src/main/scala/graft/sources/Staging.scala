package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.PlanBridge
import graft.plans.{PinPartitioningStrategy, SnapshotFacts}

/** Multi-consumer staging: materialize a frame ONCE so several
  * downstream branches (or loop iterations) read a snapshot instead of
  * re-executing the upstream DAG.
  *
  * Two modes, selected by session conf:
  *
  *  - default: `localCheckpoint(eager)` — blocks live in executor
  *    memory/disk, zero external I/O. Right for local runs and
  *    interactive work, but on a real cluster an executor loss mid-query
  *    KILLS the query (localCheckpoint truncates lineage without a
  *    recoverable copy).
  *  - `graft.staging.reliable=true`: a RELIABLE checkpoint to the
  *    Spark checkpoint directory (HDFS/object store) — executor loss
  *    recomputes from the checkpoint instead of failing the query. Set
  *    `graft.staging.dir` (or `SparkContext.setCheckpointDir`) to the
  *    durable location. This is the cluster-run switch: same plans,
  *    same results (StagingSpec pins result equality on the heaviest
  *    shared-panel query), different fault-tolerance contract.
  *
  * Three staging primitives, by how much the snapshot TELLS the
  * planner (measured on the sf0.1 graph lane — each works where the
  * cheaper one measurably loses):
  *
  *  - [[snapshot]]: engine-estimated statistics only (Spark 4
  *    propagates the source plan's estimate through the checkpoint).
  *    The default. In job-count-bound loops over SMALL frames this is
  *    also the FASTEST: AQE turns the tiny shuffles into broadcast
  *    reads in-process, cheaper than the driver-side broadcast builds
  *    that exact sizes would trigger statically.
  *  - [[snapshotMeasured]]: + the TRUE materialized byte count from
  *    the block manager ([[graft.plans.SnapshotFacts]] — the same fact
  *    a lakehouse catalog would hold). Use when the frame joins a big
  *    stream side EVERY iteration and the engine estimate is a
  *    join-output blowup: the static broadcast pick then saves a
  *    per-round shuffle + AQE replan (HITS measured −40%).
  *  - [[snapshotKeyed]]: + a pinned `HashPartitioning(keys, n)`
  *    layout. Use for big-frame self-joins and for every loop frame in
  *    the big regime, where co-partitioned joins must not re-exchange.
  */
object Staging {

  def snapshot(df: DataFrame): DataFrame = rawSnapshot(df)

  /** Plain snapshot + measured-size statistics (see object doc). */
  def snapshotMeasured(df: DataFrame): DataFrame = withFacts(rawSnapshot(df), Nil)

  /** Keyed snapshot for ITERATIVE consumers (graph loops, repeated
    * self-joins): additionally guarantees — and pins through the
    * checkpoint — a `HashPartitioning(keys, shufflePartitions)`
    * layout, so every downstream join/aggregate on the same keys
    * reuses the partitioning instead of re-exchanging the frame. ONE
    * materialization: the frame is checkpointed directly off the
    * `repartition(n, keys)` exchange.
    *
    * WHEN TO USE — the pin only pays when the join's OTHER side can't
    * broadcast. A broadcast join never shuffles the big side, so a
    * pre-arranged layout is worthless there, and the repartition pass
    * this snapshot adds is pure overhead (measured: pinning every
    * graph-loop frame at sf0.1, where label frames are ~2 MB, ran the
    * lane 3× slower). Call sites therefore choose per REGIME:
    * unconditionally for big-frame SELF-joins (both sides are the
    * same frame — never broadcastable), and via [[wantsPin]] on the
    * measured label/node frame for message-passing loops — the same
    * query broadcasts at sf0.1 and runs co-partitioned at 100 TB with
    * no code change.
    *
    * Degrades to a plain unpinned snapshot (correct, just re-exchanged)
    * on a session without [[graft.plans.GraftExtensions]]. */
  def snapshotKeyed(df: DataFrame, keys: String*): DataFrame = {
    require(keys.nonEmpty, "snapshotKeyed: at least one key column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    withFacts(rawSnapshot(df.repartition(n, keys.map(col): _*)), keys)
  }

  /** Measured materialized size of ANY eager snapshot (read from the
    * block manager — works whether or not the frame carries
    * [[graft.plans.SnapshotFacts]]). The loops' regime probe. */
  def measuredSize(df: DataFrame): Option[BigInt] = measuredBytes(df)

  /** The pin dial: a frame bigger than this can't be broadcast, so
    * loops carrying it should run in the co-partitioned (pinned)
    * regime. Defaults to the session broadcast threshold; override via
    * `graft.staging.pinThreshold` (bytes). A broadcast-off session
    * (threshold -1) always pins. */
  def pinThreshold(df: DataFrame): Long = {
    val spark = df.sparkSession
    val t = spark.conf
      .getOption("graft.staging.pinThreshold")
      .getOrElse(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
      .stripSuffix("b").toLong
    if (t < 0) 0L else t
  }

  /** True when `df` (a measured snapshot) is past the pin dial — i.e.
    * joins against it will NOT broadcast it, so loops should pin their
    * layouts. Unmeasured frames report false (broadcast regime — the
    * status-quo plan, never a layout lie). */
  def wantsPin(df: DataFrame): Boolean =
    measuredSize(df).exists(_ > pinThreshold(df))

  /** Explicitly free a snapshot's blocks (e.g. after re-keying it into
    * a pinned copy). The frame must not be used afterwards — a local
    * checkpoint cannot be recomputed. */
  def release(df: DataFrame): Unit =
    PlanBridge.logicalPlan(df).collectFirst { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(blocking = false))

  /** Attach measured size (and, for non-empty `keys`, the layout pin)
    * to an eager snapshot. No-op without the extension or when the
    * blocks aren't in the block manager (reliable-checkpoint mode). */
  private def withFacts(snapped: DataFrame, keys: Seq[String]): DataFrame = {
    if (!pinInstalled(snapped)) return snapped
    val measured = measuredBytes(snapped)
    if (keys.isEmpty && measured.isEmpty) return snapped
    val plan = PlanBridge.logicalPlan(snapped)
    val attrs = keys.map { k =>
      plan.output.find(_.name == k).getOrElse(throw new IllegalArgumentException(
        s"snapshotKeyed: key '$k' not among ${plan.output.map(_.name).mkString(", ")}"))
    }
    val n = snapped.sparkSession.sessionState.conf.numShufflePartitions
    PlanBridge.ofRows(snapped, SnapshotFacts(attrs, n, measured, plan))
  }

  /** True materialized bytes of an eager snapshot, from the block
    * manager (mem + disk). None when untracked (reliable checkpoints
    * don't persist; block reports can lag a kill). */
  private def measuredBytes(snapped: DataFrame): Option[BigInt] = {
    val m = PlanBridge.logicalPlan(snapped).collectFirst { case l: LogicalRDD => l.rdd.id }
      .flatMap { id =>
        snapped.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == id).map(i => BigInt(i.memSize + i.diskSize))
      }
    if (sys.env.get("SPARK_GRAFT_STAGE_DEBUG").contains("1"))
      System.err.println(s"[staging] snapshot cols=${snapped.columns.mkString(",")} " +
        s"bytes=${m.getOrElse(-1)}")
    m
  }

  private def pinInstalled(df: DataFrame): Boolean =
    df.sparkSession.sessionState.planner.strategies
      .exists(_.isInstanceOf[PinPartitioningStrategy])

  private def rawSnapshot(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption("graft.staging.reliable").exists(_.toBoolean)
    if (!reliable) df.localCheckpoint(eager = true)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        spark.conf.getOption("graft.staging.dir") match {
          case Some(dir) => sc.setCheckpointDir(dir)
          case None => throw new IllegalStateException(
            "graft.staging.reliable=true needs a checkpoint dir: set " +
              "graft.staging.dir or SparkContext.setCheckpointDir")
        }
      df.checkpoint(eager = true)
    }
  }

  /** `.snapshot()` postfix form so staging points read like the
    * `.localCheckpoint(true)` calls they replace. */
  implicit class Snapshottable(private val df: DataFrame) extends AnyVal {
    def snapshot(): DataFrame = Staging.snapshot(df)
    def snapshotKeyed(keys: String*): DataFrame = Staging.snapshotKeyed(df, keys: _*)
  }
}
