package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.operators._
import graft.sources.{Adapters, Tables}

/** Driver contract — maps every operator in SURVEY.md §2 (plus the
  * LLM-data-pipeline extensions) to a query over the shared testdata
  * tables, with a DuckDB oracle mirroring the exact expression tree.
  *
  * Numeric-determinism policy (why oracles hash-match): see
  * [[graft.functions.Funcs.rd]] (floor-based rounding) and
  * [[graft.functions.Funcs.scaled]] (exact fixed-point aggregation).
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    DailyAnalytics.martStockPerformance(
      Adapters.dailyBars(spark, "/root/testdata/sf0.001"))

  // ──────────────────────────────────────────────────────────────────
  // Daily (batch) lane — SURVEY §2.2/2.3/2.4/2.5 on lineitem-bars
  // ──────────────────────────────────────────────────────────────────

  /** S1/S9 + P1-P10 + F1/F2: scan, rename/cast projections, quality
    * filters, dedup on the natural key. */
  private def qCleanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        upper(trim(col("l_returnflag"))).as("return_flag"),
        col("l_suppkey").as("symbol"),
        to_date(col("l_shipdate")).as("trade_date"),
        col("l_extendedprice").as("close_price"),
        col("l_quantity").cast("long").as("volume"))
      .filter(
        col("close_price") > 0 && col("symbol").isNotNull &&
          col("trade_date").isNotNull && col("volume") >= 0 &&
          col("trade_date") <= lit("2002-01-01").cast("date"))
      .select("return_flag", "symbol", "trade_date")
      .distinct()
      .orderBy("symbol", "trade_date", "return_flag")

  private def qDailyReturns(s: SparkSession, dir: String): DataFrame =
    DailyAnalytics.dailyReturns(Adapters.dailyBars(s, dir))
      .orderBy("symbol", "trade_date")

  private def qRollingMetrics(s: SparkSession, dir: String): DataFrame =
    DailyAnalytics.rollingMetrics(DailyAnalytics.dailyReturns(Adapters.dailyBars(s, dir)))
      .select("symbol", "trade_date", "sma_5d", "sma_10d", "sma_20d", "sma_50d",
        "volatility_20d_pct", "annualised_volatility_pct",
        "avg_volume_20d", "volume_vs_avg_20d", "rsi_14")
      .orderBy("symbol", "trade_date")

  private def qMartStockPerformance(s: SparkSession, dir: String): DataFrame =
    DailyAnalytics.martStockPerformance(Adapters.dailyBars(s, dir))
      .orderBy("symbol", "trade_date")

  /** J2 — the literal returns ⋈ rolling equi join of the reference mart. */
  private def qReturnsJoinRolling(s: SparkSession, dir: String): DataFrame =
    DailyAnalytics.joinedStockPerformance(Adapters.dailyBars(s, dir))
      .select("symbol", "trade_date", "daily_return_pct", "sma_20d", "rsi_14",
        "volume_vs_avg_20d")
      .orderBy("symbol", "trade_date")

  private def qMartDailySummary(s: SparkSession, dir: String): DataFrame =
    DailyAnalytics.martDailySummary(
      DailyAnalytics.martStockPerformance(Adapters.dailyBars(s, dir)))

  // ──────────────────────────────────────────────────────────────────
  // Realtime (tick) lane — SURVEY §2.4 A1/A2, §2.3 J1, §2.5 W7/W8
  // ──────────────────────────────────────────────────────────────────

  private def qTickWindows15m(s: SparkSession, dir: String): DataFrame =
    TickAnalytics.windowAggregatesExact(Adapters.ticks(s, dir), "15 minutes")
      .orderBy("symbol", "window_start")

  private def qTickWindows1h(s: SparkSession, dir: String): DataFrame =
    TickAnalytics.windowAggregatesExact(Adapters.ticks(s, dir), "1 hour")
      .orderBy("symbol", "window_start")

  private def qRealtimeAnalytics(s: SparkSession, dir: String): DataFrame =
    TickAnalytics.realtimeAnalytics(Adapters.ticks(s, dir))
      .orderBy("symbol", "window_start")

  private val now2024 = "2024-02-01 00:00:00"

  private def qMartRealtimeSignals(s: SparkSession, dir: String): DataFrame =
    TickAnalytics.martRealtimeSignals(
      TickAnalytics.realtimeEnriched(
        TickAnalytics.stagingRealtime(
          TickAnalytics.realtimeAnalytics(Adapters.ticks(s, dir)),
          lit(now2024).cast("timestamp_ntz"))))
      .orderBy("symbol", "window_start_at")

  // ──────────────────────────────────────────────────────────────────
  // Registry
  // ──────────────────────────────────────────────────────────────────

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean_project" -> (qCleanProject _),
    "q_daily_returns" -> (qDailyReturns _),
    "q_rolling_metrics" -> (qRollingMetrics _),
    "q_mart_stock_performance" -> (qMartStockPerformance _),
    "q_returns_join_rolling" -> (qReturnsJoinRolling _),
    "q_mart_daily_summary" -> (qMartDailySummary _),
    "q_tick_windows_15m" -> (qTickWindows15m _),
    "q_tick_windows_1h" -> (qTickWindows1h _),
    "q_realtime_analytics" -> (qRealtimeAnalytics _),
    "q_mart_realtime_signals" -> (qMartRealtimeSignals _)
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
