package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs._

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
