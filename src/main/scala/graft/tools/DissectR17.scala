package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{rd, scaled}
import graft.operators.DailyAnalytics
import graft.sources.Marts
import graft.sources.Staging.Snapshottable

/** r17 scratch A/B of the Bradley-Terry lane variants (NOT part of the
  * driver contract; delete after the round). All variants run in ONE
  * process, interleaved, so JVM warmth cancels out. */
object DissectR17 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-dissect-r17")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
    })
    def stage[T](label: String)(f: => T): T = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      Thread.sleep(250)
      val (j0, t0m) = (jobs.get, taskMs.get)
      val t0 = System.nanoTime()
      val out = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(250)
      println(f"[dissect] $label%-30s $dt%7.2f s jobs=${jobs.get - j0}%3d " +
        f"taskSec=${(taskMs.get - t0m) / 1e3}%7.1f")
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = true)
      }
      out
    }

    val mart = Marts.dailyReturns(spark, dir)
    mart.count()

    /** HEAD-identical Cohorts.bradleyTerry (no per-round w snapshot). */
    def btOld(games: DataFrame, rounds: Int): DataFrame = {
      val grid = games.select(col("i"), col("j"),
        col("n").cast("long").as("n"), col("wi").cast("long").as("wi"))
        .snapshot()
      val totals = grid.groupBy(col("i").as("symbol"))
        .agg(sum(col("wi")).as("wins"), sum(col("n")).as("games"))
        .snapshot()
      var w = totals.select(col("symbol"), lit(1000000000L).as("w9"))
      for (_ <- 1 to rounds) {
        val t = grid
          .join(broadcast(w.select(col("symbol").as("i"), col("w9").as("wi9"))), "i")
          .join(broadcast(w.select(col("symbol").as("j"), col("w9").as("wj9"))), "j")
          .withColumn("t12", scaled(col("n").cast("double") * lit(1.0e9) /
            (col("wi9") + col("wj9")).cast("double"), 12))
          .groupBy(col("i").as("symbol"))
          .agg(sum(col("t12")).as("t12"))
        w = totals.join(t, "symbol")
          .select(col("symbol"),
            scaled(col("wins").cast("double") * lit(1.0e12) /
              col("t12").cast("double"), 9).as("w9"))
      }
      val tot = w.agg(sum(col("w9")).as("sw"))
      w.join(totals, "symbol")
        .crossJoin(broadcast(tot))
        .select(col("symbol"),
          col("games").cast("long").as("games"),
          col("wins").cast("long").as("wins"),
          rd(col("w9").cast("double") / col("sw").cast("double"), 6)
            .as("bt_strength"))
    }

    def both(p: DataFrame): DataFrame =
      p.select(col("i"), col("j"), col("n"), col("wi"))
        .unionByName(p.select(col("j").as("i"), col("i").as("j"), col("n"),
          (col("n") - col("wi")).as("wi")))

    for (rep <- 1 to 4) {
      println(s"=== rep $rep ===")
      stage("V2 p.snap + old join MM") {
        val p = DailyAnalytics.headToHead(mart).snapshot()
        btOld(both(p), 2).orderBy("symbol").count()
      }
      stage("V4 p.snap + array/map MM") {
        graft.SparkEntry.queries("q_bradley_terry")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
