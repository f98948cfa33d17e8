package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Port of the reference batch job's cleaning stage
  * (spark_batch_processor.py:41-54): renames, date/timestamp casts,
  * quality filters, dedup on (symbol, trade_date) — P1-P6 + P10 —
  * plus the staging-layer extras the dbt view adds on top
  * (stg_daily_stock_metrics.sql:52-58): not-null keys, volume ≥ 0,
  * no future dates.
  */
object BatchCleaner {

  /** raw daily bars → canonical clean bars. `today` is injected for
    * deterministic tests (reference uses current_date()). */
  def cleanDailyBars(raw: DataFrame, today: Column = current_date()): DataFrame =
    raw
      .withColumn("trade_date", to_date(col("date")))
      .withColumnRenamed("daily_open", "open_price")
      .withColumnRenamed("daily_high", "high_price")
      .withColumnRenamed("daily_low", "low_price")
      .withColumnRenamed("daily_close", "close_price")
      .withColumnRenamed("daily_volume", "volume")
      .withColumn("symbol", upper(trim(col("symbol"))))
      .withColumn("batch_loaded_at", to_timestamp(col("batch_load_timestamp")))
      .drop("date", "batch_load_timestamp")
      .filter(col("close_price") > 0 && col("close_price").isNotNull)
      .filter(col("symbol").isNotNull && col("trade_date").isNotNull)
      .filter(col("volume") >= 0)
      .filter(col("trade_date") <= today)
      .dropDuplicates(Seq("symbol", "trade_date"))

  /** raw ticks → canonical ticks (spark_stream_batch_processor.py:39). */
  def cleanTicks(raw: DataFrame): DataFrame =
    raw
      .withColumn("event_time", to_timestamp(col("timestamp")))
      .drop("timestamp")
      .filter(col("symbol").isNotNull && col("event_time").isNotNull)
}
