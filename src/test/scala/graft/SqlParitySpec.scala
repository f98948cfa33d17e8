package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.DailyAnalytics
import graft.sources.{Adapters, Schemas, Sinks}

/** The engine's surface is equally reachable through `spark.sql` —
  * temp views + SQL text produce the same frames as the DataFrame API
  * (same Catalyst plans underneath). */
class SqlParitySpec extends AnyFunSpec {
  import SharedSpark.spark

  describe("spark.sql parity") {
    it("SQL window text equals the DataFrame dailyReturns stage") {
      Adapters.dailyBars(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("bars_v")
      val sql = spark.sql(
        """SELECT symbol, trade_date, close_price,
          |  LAG(close_price) OVER (PARTITION BY symbol ORDER BY trade_date) AS prev_close_price,
          |  FLOOR(((close_price - LAG(close_price) OVER (PARTITION BY symbol ORDER BY trade_date))
          |    / NULLIF(LAG(close_price) OVER (PARTITION BY symbol ORDER BY trade_date), 0) * 100) * 10000.0 + 0.5) / 10000.0
          |    AS daily_return_pct
          |FROM bars_v""".stripMargin)
      val df = DailyAnalytics.dailyReturns(Adapters.dailyBars(spark, "/root/testdata/sf0.001"))
        .select("symbol", "trade_date", "close_price", "prev_close_price", "daily_return_pct")
      assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
    }

    it("rolling_hash is callable from SQL (extension-registered)") {
      val r = spark.sql("SELECT rolling_hash('hi') AS h").collect().head.getLong(0)
      assert(r == (104L * 31 + 105) % 1000000007L)
    }

    it("SQL list-fold text equals the DataFrame EMA operator") {
      Adapters.dailyBars(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("bars_ema_v")
      val sql = spark.sql(
        """SELECT symbol, CAST(size(tps) AS BIGINT) AS n_days,
          |  FLOOR((CAST(aggregate(
          |      slice(transform(tps, t -> t.p), 2, greatest(size(tps) - 1, 0)),
          |      element_at(transform(tps, t -> t.p), 1),
          |      (acc, x) -> (2 * x + 11 * acc) div 13) AS DOUBLE) / 100.0)
          |    * 10000.0 + 0.5) / 10000.0 AS ema_12
          |FROM (SELECT symbol, sort_array(collect_list(
          |        struct(trade_date, CAST(FLOOR(close_price * 100.0 + 0.5) AS BIGINT) AS p))) AS tps
          |      FROM bars_ema_v GROUP BY symbol)""".stripMargin)
      val df = DailyAnalytics.emaClose(Adapters.dailyBars(spark, "/root/testdata/sf0.001"))
      assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
    }

    it("ensureTable bootstraps an idempotent warehouse table (S8)") {
      Sinks.ensureTable(spark, "daily_stock_metrics_t", Schemas.rawDailyBar)
      Sinks.ensureTable(spark, "daily_stock_metrics_t", Schemas.rawDailyBar) // idempotent
      assert(spark.table("daily_stock_metrics_t").schema.fieldNames.contains("daily_close"))
    }
  }
}
