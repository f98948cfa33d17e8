package graft.sources

import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}

/** Explicit schemas + case classes for the reference's raw zone — no
  * inference pass ever runs (reference: spark_batch_processor.py:27-36,
  * spark_stream_batch_processor.py:26-34 hand-declare StructTypes).
  * Prices are declared DOUBLE here (the reference reads FloatType and
  * re-casts in dbt; we standardize on double inside the engine and
  * round at published edges — SURVEY §1.2).
  */
object Schemas {

  /** raw/historical CSV rows (batch_data_consumer.py:33). */
  val rawDailyBar: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("date", StringType),
    StructField("daily_open", DoubleType),
    StructField("daily_high", DoubleType),
    StructField("daily_low", DoubleType),
    StructField("daily_close", DoubleType),
    StructField("daily_volume", LongType),
    StructField("batch_load_timestamp", StringType)))

  /** raw/realtime CSV rows (realtime_data_consumer.py:33). */
  val rawTick: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", StringType),
    StructField("price", DoubleType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("volume", LongType)))

  /** sp500_tickers seed dimension (dbt/seeds/sp500_tickers.csv:1). */
  val tickerDim: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("company_name", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("market_cap_tier", StringType)))

  /** Canonical clean daily bar (processed/historical zone,
    * spark_batch_processor.py:41-54). */
  case class DailyBar(symbol: String, trade_date: Date,
                      open_price: Double, high_price: Double,
                      low_price: Double, close_price: Double,
                      volume: Long, batch_loaded_at: Timestamp)

  /** Canonical tick (the realtime lane's unit of work). */
  case class Tick(symbol: String, event_time: Timestamp,
                  price: Double, volume: Long)
}
