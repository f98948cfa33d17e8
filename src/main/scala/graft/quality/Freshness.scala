package graft.quality

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-freshness checks — dbt's `source freshness` gate
  * (dbt/models/staging/sources.yml:11-14 gives the batch source
  * warn_after 25h / error_after 49h on BATCH_LOAD_TIMESTAMP;
  * sources.yml:52-55 gives the stream source 2h / 6h on
  * LOAD_TIMESTAMP).
  *
  * One partial-aggregable `max(loaded_at)` scan per source — no
  * ordering, no window. `now` is always injected (never
  * `current_timestamp` inside the check) so results are reproducible
  * and testable, per the repo-wide determinism policy.
  */
object Freshness {

  sealed abstract class Status(val label: String)
  case object Fresh extends Status("fresh")
  case object Stale extends Status("warn")
  case object Expired extends Status("error")
  case object NoData extends Status("no_data")

  final case class Result(source: String, maxLoadedAt: Option[java.sql.Timestamp],
                          ageSeconds: Option[Long], status: Status)

  /** Age of the newest row vs `now`, classified by the thresholds.
    * An empty source is `NoData` (treated as error by [[enforce]]). */
  def check(df: DataFrame, loadedAtCol: String, now: Column,
            warnAfter: Duration, errorAfter: Duration,
            source: String = "source"): Result = {
    val row = df.agg(max(col(loadedAtCol)).as("max_loaded_at"))
      .select(col("max_loaded_at"),
        (unix_timestamp(now) - unix_timestamp(col("max_loaded_at"))).as("age_s"))
      .collect().head
    Option(row.getAs[java.sql.Timestamp]("max_loaded_at")) match {
      case None => Result(source, None, None, NoData)
      case Some(ts) =>
        val age = row.getAs[Long]("age_s")
        val status =
          if (age > errorAfter.getSeconds) Expired
          else if (age > warnAfter.getSeconds) Stale
          else Fresh
        Result(source, Some(ts), Some(age), status)
    }
  }

  /** The dbt contract: warn logs, error (or an empty source) throws. */
  def enforce(df: DataFrame, loadedAtCol: String, now: Column,
              warnAfter: Duration, errorAfter: Duration,
              source: String = "source"): Result = {
    val r = check(df, loadedAtCol, now, warnAfter, errorAfter, source)
    r.status match {
      case Expired | NoData =>
        throw new IllegalStateException(
          s"source ${r.source} freshness ${r.status.label}: age=${r.ageSeconds.getOrElse(-1L)}s " +
            s"exceeds error_after=${errorAfter.getSeconds}s")
      case Stale =>
        println(s"[quality] WARN source ${r.source} stale: age=${r.ageSeconds.get}s " +
          s"exceeds warn_after=${warnAfter.getSeconds}s")
      case _ => ()
    }
    r
  }

  /** sources.yml:11-14 — snowflake_batch: 25h warn / 49h error. */
  def batchThresholds: (Duration, Duration) =
    (Duration.ofHours(25), Duration.ofHours(49))

  /** sources.yml:52-55 — snowflake_stream: 2h warn / 6h error. */
  def streamThresholds: (Duration, Duration) =
    (Duration.ofHours(2), Duration.ofHours(6))
}
