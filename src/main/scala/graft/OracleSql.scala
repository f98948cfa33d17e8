package graft

import graft.sources.Adapters

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]].
  *
  * Each statement mirrors the Spark plan's EXACT scalar expression
  * trees (same operand order, same floor-based rounding — see
  * Funcs.rd/Funcs.scaled) so that double outputs are bit-identical,
  * not merely approximately equal.
  */
object OracleSql {

  /** rd(expr, scale) — deterministic rounding, mirrors Funcs.rd. */
  private def rd(expr: String, scale: Int): String = {
    val p = "1" + "0" * scale + ".0"
    s"FLOOR(($expr) * $p + 0.5) / $p"
  }

  /** mirrors Funcs.scaled(expr, s) — exact fixed-point long view. */
  private def sc(expr: String, scale: Int): String = {
    val p = "1" + "0" * scale + ".0"
    s"CAST(FLOOR(($expr) * $p + 0.5) AS BIGINT)"
  }
  private def sc4(expr: String): String = sc(expr, 4)

  // ── daily lane CTE chain ──────────────────────────────────────────

  private val returnsSql: String =
    s"""returns AS (
       |  SELECT symbol, trade_date, open_price, high_price, low_price, close_price, volume,
       |    LAG(close_price) OVER w AS prev_close_price,
       |    ${rd("(close_price - LAG(close_price) OVER w) / NULLIF(LAG(close_price) OVER w, 0) * 100", 4)} AS daily_return_pct,
       |    ${rd("high_price - low_price", 4)} AS intraday_range,
       |    ${rd("(high_price - low_price) / NULLIF(close_price, 0) * 100", 4)} AS intraday_range_pct,
       |    ${rd("open_price - LAG(close_price) OVER w", 4)} AS overnight_gap,
       |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS symbol_row_num
       |  FROM bars
       |  WINDOW w AS (PARTITION BY symbol ORDER BY trade_date)
       |)""".stripMargin

  private val rollingSql: String = {
    val closeFp = sc("close_price", 2)
    def sma(w: String) = rd(s"AVG($closeFp) OVER $w / 100.0", 4)
    val gain = s"AVG(${sc4("CASE WHEN daily_return_pct > 0 THEN daily_return_pct ELSE 0 END")}) OVER w14 / 10000.0"
    val loss = s"AVG(${sc4("CASE WHEN daily_return_pct < 0 THEN ABS(daily_return_pct) ELSE 0 END")}) OVER w14 / 10000.0"
    s"""rolling AS (
       |  SELECT *,
       |    ${sma("w5")} AS sma_5d,
       |    ${sma("w10")} AS sma_10d,
       |    ${sma("w20")} AS sma_20d,
       |    ${sma("w50")} AS sma_50d,
       |    ${rd("STDDEV_SAMP(daily_return_pct) OVER w20", 4)} AS volatility_20d_pct,
       |    ${rd("STDDEV_SAMP(daily_return_pct) OVER w20 * SQRT(252.0)", 4)} AS annualised_volatility_pct,
       |    CAST(FLOOR(AVG(volume) OVER w20 + 0.5) AS DOUBLE) AS avg_volume_20d,
       |    ${rd("volume / NULLIF(AVG(volume) OVER w20, 0)", 4)} AS volume_vs_avg_20d,
       |    ${rd(s"100 - (100 / (1 + NULLIF(($gain) / NULLIF($loss, 0), 0)))", 2)} AS rsi_14
       |  FROM returns
       |  WINDOW
       |    w5  AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       |    w10 AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       |    w20 AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
       |    w50 AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
       |    w14 AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |)""".stripMargin
  }

  private val perfSql: String =
    s"""perf AS (
       |  SELECT symbol, trade_date, open_price, high_price, low_price, close_price, volume,
       |    prev_close_price, daily_return_pct, intraday_range, intraday_range_pct, overnight_gap,
       |    sma_5d, sma_10d, sma_20d, sma_50d,
       |    volatility_20d_pct, annualised_volatility_pct, avg_volume_20d, volume_vs_avg_20d, rsi_14,
       |    CASE WHEN sma_5d > sma_20d THEN 'GOLDEN_CROSS' WHEN sma_5d < sma_20d THEN 'DEATH_CROSS' ELSE 'NEUTRAL' END AS ma_signal_5_20,
       |    CASE WHEN sma_10d > sma_50d THEN 'GOLDEN_CROSS' WHEN sma_10d < sma_50d THEN 'DEATH_CROSS' ELSE 'NEUTRAL' END AS ma_signal_10_50,
       |    CASE WHEN volume_vs_avg_20d >= 2.0 THEN true ELSE false END AS is_high_volume_day,
       |    CASE WHEN rsi_14 >= 70 THEN 'OVERBOUGHT' WHEN rsi_14 <= 30 THEN 'OVERSOLD' ELSE 'NEUTRAL' END AS rsi_signal,
       |    MAX(high_price) OVER w252 AS high_52w,
       |    MIN(low_price) OVER w252 AS low_52w,
       |    ${rd("(close_price - MIN(low_price) OVER w252) / NULLIF(MAX(high_price) OVER w252 - MIN(low_price) OVER w252, 0) * 100", 2)} AS pct_of_52w_range
       |  FROM rolling
       |  WINDOW w252 AS (PARTITION BY symbol ORDER BY trade_date ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  private def dailyChain(upTo: String): String =
    "WITH " + (upTo match {
      case "bars"    => Adapters.barsSql
      case "returns" => Seq(Adapters.barsSql, returnsSql).mkString(",\n")
      case "rolling" => Seq(Adapters.barsSql, returnsSql, rollingSql).mkString(",\n")
      case "perf"    => Seq(Adapters.barsSql, returnsSql, rollingSql, perfSql).mkString(",\n")
    })

  // ── tick lane CTE chain ───────────────────────────────────────────

  /** mirrors TickAnalytics.windowAggregatesExact at priceScale=2. */
  private def tickAggSql(name: String, interval: String): String = {
    val x = "CAST(FLOOR((price) * 100.0 + 0.5) AS BIGINT)"
    s"""${name}_g AS (
       |  SELECT symbol, time_bucket(INTERVAL '$interval', event_time) AS window_start,
       |    COUNT(*) AS n, COUNT($x) AS cx, SUM($x) AS sx, SUM(($x) * ($x)) AS sxx,
       |    CAST(SUM(volume) AS BIGINT) AS volume_sum
       |  FROM ticks GROUP BY 1, 2
       |),
       |$name AS (
       |  SELECT symbol, window_start, window_start + INTERVAL '$interval' AS window_end,
       |    ${rd("sx / cx / 100.0", 4)} AS ma,
       |    CASE WHEN n > 1 THEN ${rd("SQRT((n * sxx - sx * sx) / (n * (n - 1)) / (100.0 * 100.0))", 4)} END AS volatility,
       |    volume_sum
       |  FROM ${name}_g
       |)""".stripMargin
  }

  private val m15Sql: String =
    """m15 AS (
      |  SELECT symbol, window_start, window_end, ma AS ma_15m,
      |         volatility AS volatility_15m, volume_sum AS volume_sum_15m
      |  FROM w15
      |)""".stripMargin

  private val joinedSql: String =
    """rt AS (
      |  SELECT m15.symbol, m15.window_start, m15.window_end,
      |         m15.ma_15m, m15.volatility_15m, m15.volume_sum_15m, h1.ma AS ma_1h
      |  FROM m15 LEFT JOIN h1
      |    ON m15.symbol = h1.symbol
      |   AND date_trunc('hour', m15.window_start) = h1.window_start
      |)""".stripMargin

  private val stagedSql: String =
    s"""staged AS (
       |  SELECT symbol,
       |    window_start AS window_start_at,
       |    window_end AS window_end_at,
       |    CAST(date_diff('minute', window_start, window_end) AS BIGINT) AS window_duration_minutes,
       |    ma_15m, ma_1h, volatility_15m,
       |    volume_sum_15m AS volume_15m
       |  FROM rt
       |  WHERE symbol IS NOT NULL AND window_start IS NOT NULL AND window_end IS NOT NULL
       |    AND window_start < window_end
       |    AND window_start >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 90 DAY
       |)""".stripMargin

  private val enrichedSql: String =
    s"""enriched AS (
       |  SELECT *,
       |    ${rd("ma_15m - LAG(ma_15m) OVER w", 4)} AS ma_15m_delta,
       |    ${rd("ma_1h - LAG(ma_1h) OVER w", 4)} AS ma_1h_delta,
       |    ${rd("ma_15m - ma_1h", 4)} AS ma_spread,
       |    CAST(FLOOR(AVG(volume_15m) OVER w4 + 0.5) AS DOUBLE) AS avg_volume_1h,
       |    ${rd(s"AVG(${sc4("volatility_15m")}) OVER w4 / 10000.0", 4)} AS avg_volatility_1h
       |  FROM staged
       |  WINDOW
       |    w  AS (PARTITION BY symbol ORDER BY window_start_at),
       |    w4 AS (PARTITION BY symbol ORDER BY window_start_at ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
       |),
       |signals AS (
       |  SELECT *,
       |    CASE WHEN ma_spread > 0 AND ma_15m_delta > 0 THEN 'BULLISH'
       |         WHEN ma_spread < 0 AND ma_15m_delta < 0 THEN 'BEARISH'
       |         ELSE 'NEUTRAL' END AS momentum_signal,
       |    CASE WHEN volatility_15m >= avg_volatility_1h * 2.0 THEN 'HIGH'
       |         WHEN volatility_15m >= avg_volatility_1h * 1.5 THEN 'ELEVATED'
       |         WHEN volatility_15m <= avg_volatility_1h * 0.5 THEN 'LOW'
       |         ELSE 'NORMAL' END AS volatility_regime,
       |    CASE WHEN avg_volume_1h > 0 AND volume_15m >= avg_volume_1h * 2.0 THEN true
       |         ELSE false END AS is_volume_spike
       |  FROM enriched
       |)""".stripMargin

  private def tickChain(upTo: String): String = {
    val base = Seq(Adapters.ticksSql, tickAggSql("w15", "15 minutes"), tickAggSql("h1", "1 hour"), m15Sql, joinedSql)
    "WITH " + (upTo match {
      case "w15"     => Seq(Adapters.ticksSql, tickAggSql("w15", "15 minutes")).mkString(",\n")
      case "h1"      => Seq(Adapters.ticksSql, tickAggSql("h1", "1 hour")).mkString(",\n")
      case "rt"      => base.mkString(",\n")
      case "signals" => (base ++ Seq(stagedSql, enrichedSql)).mkString(",\n")
    })
  }

  // ── per-query statements ──────────────────────────────────────────

  val all: Map[String, String] = Map(
    "q_clean_project" ->
      """SELECT DISTINCT UPPER(TRIM(l_returnflag)) AS return_flag, l_suppkey AS symbol,
        |  CAST(l_shipdate AS DATE) AS trade_date
        |FROM lineitem
        |WHERE l_extendedprice > 0 AND l_suppkey IS NOT NULL
        |  AND CAST(l_shipdate AS DATE) IS NOT NULL
        |  AND CAST(l_quantity AS BIGINT) >= 0
        |  AND CAST(l_shipdate AS DATE) <= DATE '2002-01-01'
        |ORDER BY symbol, trade_date, return_flag""".stripMargin,

    "q_daily_returns" ->
      s"""${dailyChain("returns")}
         |SELECT * FROM returns ORDER BY symbol, trade_date""".stripMargin,

    "q_rolling_metrics" ->
      s"""${dailyChain("rolling")}
         |SELECT symbol, trade_date, sma_5d, sma_10d, sma_20d, sma_50d,
         |  volatility_20d_pct, annualised_volatility_pct, avg_volume_20d, volume_vs_avg_20d, rsi_14
         |FROM rolling ORDER BY symbol, trade_date""".stripMargin,

    "q_mart_stock_performance" ->
      s"""${dailyChain("perf")}
         |SELECT * FROM perf ORDER BY symbol, trade_date""".stripMargin,

    "q_returns_join_rolling" ->
      s"""${dailyChain("rolling")}
         |SELECT r.symbol, r.trade_date, r.daily_return_pct, m.sma_20d, m.rsi_14, m.volume_vs_avg_20d
         |FROM returns r JOIN rolling m ON r.symbol = m.symbol AND r.trade_date = m.trade_date
         |ORDER BY r.symbol, r.trade_date""".stripMargin,

    "q_mart_daily_summary" ->
      s"""${dailyChain("perf")},
         |sb AS (
         |  SELECT *, ${sc4("daily_return_pct")} AS ret_i,
         |    ${sc4("volume_vs_avg_20d")} AS vvn_i,
         |    ${sc4("annualised_volatility_pct")} AS av_i,
         |    ${sc4("intraday_range_pct")} AS ir_i
         |  FROM perf
         |),
         |ranked AS (
         |  SELECT trade_date, symbol,
         |    ROW_NUMBER() OVER (PARTITION BY trade_date ORDER BY daily_return_pct DESC, symbol DESC) AS rn_g,
         |    ROW_NUMBER() OVER (PARTITION BY trade_date ORDER BY daily_return_pct ASC, symbol ASC) AS rn_l
         |  FROM sb WHERE daily_return_pct IS NOT NULL
         |),
         |gl AS (
         |  SELECT trade_date,
         |    MAX(CASE WHEN rn_g = 1 THEN symbol END) AS top_gainer_symbol,
         |    MAX(CASE WHEN rn_l = 1 THEN symbol END) AS top_loser_symbol
         |  FROM ranked GROUP BY trade_date
         |)
         |SELECT sb.trade_date,
         |  COUNT(DISTINCT symbol) AS symbols_tracked,
         |  COUNT(*) FILTER (WHERE daily_return_pct > 0) AS advancers,
         |  COUNT(*) FILTER (WHERE daily_return_pct < 0) AS decliners,
         |  COUNT(*) FILTER (WHERE daily_return_pct = 0) AS unchanged,
         |  ${rd("COUNT(*) FILTER (WHERE daily_return_pct > 0) / NULLIF(COUNT(DISTINCT symbol), 0) * 100", 1)} AS advance_decline_ratio_pct,
         |  ${rd("SUM(ret_i) / COUNT(ret_i) / 10000.0", 4)} AS avg_return_pct,
         |  ${rd("MEDIAN(ret_i) / 10000.0", 4)} AS median_return_pct,
         |  ${rd("STDDEV_SAMP(daily_return_pct)", 4)} AS return_stddev,
         |  MAX(daily_return_pct) AS best_return_pct,
         |  MIN(daily_return_pct) AS worst_return_pct,
         |  MAX(gl.top_gainer_symbol) AS top_gainer_symbol,
         |  MAX(gl.top_loser_symbol) AS top_loser_symbol,
         |  CAST(SUM(volume) AS BIGINT) AS total_volume,
         |  ${rd("SUM(vvn_i) / COUNT(vvn_i) / 10000.0", 4)} AS avg_volume_vs_norm,
         |  COUNT(*) FILTER (WHERE is_high_volume_day) AS high_volume_stocks,
         |  ${rd("SUM(av_i) / COUNT(av_i) / 10000.0", 2)} AS avg_annualised_vol_pct,
         |  ${rd("SUM(ir_i) / COUNT(ir_i) / 10000.0", 4)} AS avg_intraday_range_pct,
         |  COUNT(*) FILTER (WHERE rsi_signal = 'OVERBOUGHT') AS overbought_count,
         |  COUNT(*) FILTER (WHERE rsi_signal = 'OVERSOLD') AS oversold_count,
         |  COUNT(*) FILTER (WHERE ma_signal_5_20 = 'GOLDEN_CROSS') AS golden_cross_5_20_count,
         |  COUNT(*) FILTER (WHERE ma_signal_5_20 = 'DEATH_CROSS') AS death_cross_5_20_count
         |FROM sb LEFT JOIN gl ON sb.trade_date = gl.trade_date
         |GROUP BY sb.trade_date
         |ORDER BY sb.trade_date DESC""".stripMargin,

    "q_tick_windows_15m" ->
      s"""${tickChain("w15")}
         |SELECT symbol, window_start, window_end, ma, volatility, volume_sum
         |FROM w15 ORDER BY symbol, window_start""".stripMargin,

    "q_tick_windows_1h" ->
      s"""${tickChain("h1")}
         |SELECT symbol, window_start, window_end, ma, volatility, volume_sum
         |FROM h1 ORDER BY symbol, window_start""".stripMargin,

    "q_realtime_analytics" ->
      s"""${tickChain("rt")}
         |SELECT * FROM rt ORDER BY symbol, window_start""".stripMargin,

    "q_mart_realtime_signals" ->
      s"""${tickChain("signals")}
         |SELECT *,
         |  CASE WHEN momentum_signal != 'NEUTRAL'
         |        AND volatility_regime IN ('ELEVATED', 'HIGH')
         |        AND is_volume_spike = true THEN true ELSE false END AS is_multi_signal_alert,
         |  symbol || ' | ' || momentum_signal || ' | Vol: ' || volatility_regime
         |    || CASE WHEN is_volume_spike THEN ' | VOLUME SPIKE' ELSE '' END
         |    || ' @ ' || strftime(window_start_at, '%Y-%m-%d %H:%M') AS signal_summary
         |FROM signals ORDER BY symbol, window_start_at""".stripMargin
  )
}
