package graft.tools

import org.apache.spark.sql.SparkSession

/** r18 scratch dissection harness (delete at round end): splits a
  * registry query's wall into CONSTRUCT (DataFrame build: marts,
  * snapshots, dial probes — includes their jobs), PLAN (analysis +
  * optimization + physical planning of the final frame) and EXEC
  * (count of the planned frame), interleaved over N reps so host noise
  * hits phases evenly.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.DissectR18 q_a q_b"
  */
object DissectR18 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DissectR18 <query>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // per-stage print (SPARK_GRAFT_STAGES=1): wall, tasks, taskSec, GC
    val stageDebug = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    if (stageDebug)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          System.err.println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
            f"wall=${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%.2f " +
            f"taskSec=${m.executorRunTime / 1e3}%.1f gcSec=${m.jvmGCTime / 1e3}%.1f " +
            f"cpuSec=${m.executorCpuTime / 1e9}%.1f " +
            i.name.takeWhile(_ != '\n').take(60))
        }
      })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      (1 to 3).foreach { rep =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val (tc, df) = t(fn(spark, sfDir))
        val (tp, _) = t(df.queryExecution.executedPlan)
        val (te, n) = t(df.count())
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id)) rdd.unpersist(blocking = true)
        }
        println(f"[dissect] $name #$rep construct=$tc%.3f plan=$tp%.3f " +
          f"exec=$te%.3f total=${tc + tp + te}%.3f rows=$n")
      }
    }
    spark.stop()
  }
}
