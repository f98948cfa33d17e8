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

  /** CUPED variance-reduced experiment readout (Deng et al. 2013,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): per deterministic variant
    * (user_id parity — the hash-assignment stand-in), the raw and
    * CUPED-adjusted mean post-period purchase revenue, where the
    * adjustment Y − θ(X − x̄) uses each user's PRE-period revenue as
    * the covariate and the pooled θ = cov(X,Y)/var(X). The period
    * cutoff is derived from the data (min date + ⌊span/2⌋ days), so
    * the query is parameter-free and engine-portable.
    *
    * Determinism: X and Y are exact cent-scaled longs; θ's
    * numerator/denominator are the textbook n·Σxy − Σx·Σy forms
    * computed in DECIMAL(38,0) (mirroring DuckDB's HUGEINT sums —
    * both exact, so the final double casts bit-match), and every
    * reported mean applies one division tree identical in both
    * engines before the 4-dp floor-round.
    *
    * Scale shape: one partial-aggregable shuffle to the per-user
    * grain (conditional sums — the event stream never shuffles raw),
    * then a 1-row pooled aggregate broadcast back over the 2-row
    * variant aggregate. The date bounds are a 1-row broadcast cross
    * join, same as every calendar-derived literal in the daily lane. */
  def cupedLift(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, valueCol: String,
                eventType: String = "purchase"): DataFrame = {
    val d = to_date(col(tsCol))
    val bounds = events.agg(min(d).as("dmin"), max(d).as("dmax"))
    val dec = "decimal(38,0)"
    val perUser = events.crossJoin(broadcast(bounds))
      // floor EXPLICITLY: Spark's double→int cast truncates while
      // DuckDB's rounds, so a bare (days/2) cast would diverge on odd
      // spans
      .withColumn("cut", date_add(col("dmin"),
        floor(datediff(col("dmax"), col("dmin")) / 2).cast("int")))
      .groupBy(col(userCol).as("user_id"))
      .agg(
        sum(when(col(typeCol) === eventType && d < col("cut"),
          scaled(col(valueCol), 2)).otherwise(0L)).as("x_c"),
        sum(when(col(typeCol) === eventType && d >= col("cut"),
          scaled(col(valueCol), 2)).otherwise(0L)).as("y_c"))
      .withColumn("variant", (col("user_id") % 2).cast("int"))
      .snapshot() // feeds the pooled 1-row agg AND the variant agg
    val pooled = perUser.agg(
      count(lit(1)).as("n_p"),
      sum(col("x_c")).as("sx_p"),
      sum(col("y_c")).as("sy_p"),
      sum(col("x_c").cast(dec) * col("y_c").cast(dec)).as("sxy_p"),
      sum(col("x_c").cast(dec) * col("x_c").cast(dec)).as("sxx_p"))
    val num = (col("n_p").cast(dec) * col("sxy_p") -
      col("sx_p").cast(dec) * col("sy_p").cast(dec)).cast("double")
    val den = (col("n_p").cast(dec) * col("sxx_p") -
      col("sx_p").cast(dec) * col("sx_p").cast(dec)).cast("double")
    val theta = when(den === 0.0, lit(0.0)).otherwise(num / den)
    perUser.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x_c")).as("sx_v"), sum(col("y_c")).as("sy_v"))
      .crossJoin(broadcast(pooled.select(theta.as("theta"),
        (col("sx_p").cast("double") / col("n_p")).as("xbar_p"))))
      .select(col("variant"), col("n_users"),
        rd(col("sy_v") / col("n_users").cast("double") / 100.0, 4).as("mean_y"),
        rd(col("theta"), 6).as("theta"),
        rd((col("sy_v") / col("n_users").cast("double") -
          col("theta") * (col("sx_v") / col("n_users").cast("double") -
            col("xbar_p"))) / 100.0, 4).as("mean_y_cuped"))
  }
}
