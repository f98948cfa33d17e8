package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapters from the driver's synthetic tables (TESTDATA.md) to the
  * engine's canonical frames, so every reference operator
  * (SURVEY.md §2) can be exercised and oracle-checked on shared data.
  *
  * Mapping rationale:
  *   - `lineitem` → daily bars: symbol := l_suppkey (100 symbols),
  *     trade_date := date(l_shipdate) (~2500 trading days). OHLC is
  *     derived with EXACT aggregates only (min/max/sum) so the bar
  *     values are bit-identical in any engine — the analytics on top
  *     then start from identical inputs. open/low and close/high
  *     coincide by construction; all downstream formulas still exercise
  *     their full logic.
  *   - `events` → realtime ticks: symbol := event_type, event_time := ts,
  *     price := value (fixed 2-decimal), volume := 1 per tick.
  */
object Adapters {

  /** Canonical daily bars from lineitem. */
  def dailyBars(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(
        col("l_suppkey").as("symbol"),
        to_date(col("l_shipdate")).as("trade_date"))
      .agg(
        min(col("l_extendedprice")).as("open_price"),
        max(col("l_extendedprice")).as("high_price"),
        min(col("l_extendedprice")).as("low_price"),
        max(col("l_extendedprice")).as("close_price"),
        sum(col("l_quantity")).cast("long").as("volume"))

  /** Canonical ticks from events. Timestamps are naive UTC
    * (TIMESTAMP_NTZ semantics, like the reference's utcnow strings).
    * events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * long (spark.sql.legacy.parquet.nanosAsLong) — convert via integer
    * division to microseconds (double math would lose precision on
    * epoch nanos > 2^53). */
  /** events.ts as a naive-UTC timestamp column (handles the
    * nanos-as-long read, see [[ticks]]). */
  def eventTime(ev: DataFrame): org.apache.spark.sql.Column =
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts DIV 1000)").cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }

  def ticks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_type").as("symbol"),
      eventTime(ev).as("event_time"),
      col("value").as("price"),
      lit(1L).as("volume"))
  }

  /** The shared oracle-SQL prelude mirroring [[dailyBars]], prepended
    * to the DuckDB oracle of every daily-lane query. */
  val barsSql: String =
    """bars AS (
      |  SELECT l_suppkey AS symbol,
      |         CAST(l_shipdate AS DATE) AS trade_date,
      |         MIN(l_extendedprice) AS open_price,
      |         MAX(l_extendedprice) AS high_price,
      |         MIN(l_extendedprice) AS low_price,
      |         MAX(l_extendedprice) AS close_price,
      |         CAST(SUM(l_quantity) AS BIGINT) AS volume
      |  FROM lineitem
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Oracle-SQL prelude mirroring [[ticks]]. */
  val ticksSql: String =
    """ticks AS (
      |  SELECT event_type AS symbol,
      |         CAST(ts AS TIMESTAMP) AS event_time,
      |         value AS price,
      |         CAST(1 AS BIGINT) AS volume
      |  FROM events
      |)""".stripMargin
}
