package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.sources.Staging.Snapshottable

/** Cohort / retention analytics over an event stream. */
object Cohorts {

  /** Day-grain N-day retention: for each activity date, how many of
    * that day's distinct active users were also active exactly
    * `horizonDays` later. The standard product-analytics cohort curve,
    * here as one deterministic relational pipeline.
    *
    * Scale shape: the raw event stream reduces FIRST to the distinct
    * (user, day) grain — one partial-aggregable shuffle, after which
    * everything operates on the reduced frame (≤ users × days rows,
    * orders of magnitude under the event count). Retention is a
    * LEFT SEMI self-join on (user, day − horizon): semi joins forward
    * no payload and short-circuit per match, and both sides share the
    * (user_id, d) key so one co-partitioning serves join and counts.
    * All-integer counts + one final division — oracle-exact.
    */
  /** Strict sequential funnel: step i counts a user only if their
    * EARLIEST qualifying event strictly follows their step-(i−1) time
    * — "viewed, then clicked after viewing, then purchased after
    * clicking", the standard conversion-funnel semantics (min-after
    * chaining, not mere per-step membership).
    *
    * Scale shape: the chain reduces to the per-user grain at every
    * step (min-timestamp grouped agg, partial-aggregable), each stage
    * is snapshotted once (it feeds both the next join and its own
    * count), and each step's join filters the event stream to ONE
    * event type map-side before shuffling. Steps are a driver-side
    * loop over a handful of literals — jobs, not state.
    *
    * Output: (step, step_name, n_users) — one row per funnel step.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame =
    funnelWithin(events, userCol, typeCol, tsCol, steps, maxGapHours = 0)

  /** [[funnel]] with a bounded conversion window: each step must
    * additionally land WITHIN `maxGapHours` of the previous step's
    * time (0 = unbounded) — the form real funnels publish, since an
    * unbounded "purchased 2 years after clicking" conversion is noise.
    * Same per-user min-after chaining and scale shape. */
  def funnelWithin(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxGapHours: Int): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(maxGapHours >= 0, s"funnel: maxGapHours must be >= 0, got $maxGapHours")
    val ev = events.select(col(userCol).as("user_id"), col(typeCol).as("et"),
      col(tsCol).as("ts"))
    var cur = ev.filter(col("et") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
      .snapshot()
    val frames = scala.collection.mutable.ArrayBuffer(cur)
    steps.tail.foreach { s =>
      val within =
        if (maxGapHours == 0) lit(true)
        else col("ts") <= col("t") + expr(s"INTERVAL $maxGapHours HOURS")
      cur = cur.join(ev.filter(col("et") === s), "user_id")
        .filter(col("ts") > col("t") && within)
        .groupBy("user_id").agg(min(col("ts")).as("t"))
        .snapshot()
      frames += cur
    }
    steps.zip(frames).zipWithIndex.map { case ((name, f), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      horizonDays: Int = 7): DataFrame = {
    val active = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"))
      .distinct()
    // user active at d + horizon, re-keyed to the cohort day it proves
    val future = active.select(col("user_id"),
      date_sub(col("d"), horizonDays).as("d"))
    val retained = active.join(future, Seq("user_id", "d"), "left_semi")
      .groupBy("d").agg(count(lit(1)).as("n_retained"))
    active.groupBy("d").agg(count(lit(1)).as("n_active"))
      .join(retained, Seq("d"), "left")
      .select(col("d").as("cohort_date"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        r4(coalesce(col("n_retained"), lit(0L)) / col("n_active").cast("double"))
          .as("retention_rate"))
  }
}
