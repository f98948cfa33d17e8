package graft.sources

import org.apache.spark.sql.DataFrame

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
  */
object Staging {

  def snapshot(df: DataFrame): DataFrame = {
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
  }
}
