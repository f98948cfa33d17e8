package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.quality.Invariants
import graft.quality.Invariants._

class InvariantsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val bars = Seq(
    // (symbol, trade_date, high, low, close, signal)
    ("AAPL", "2024-01-02", 12.0, 10.0, 11.0, "NEUTRAL"),
    ("AAPL", "2024-01-03", 9.0, 10.0, 9.5, "GOLDEN_CROSS"), // high < low
    (null.asInstanceOf[String], "2024-01-04", 12.0, 10.0, 11.0, "NEUTRAL"), // null symbol
    ("MSFT", "2031-01-01", 12.0, 10.0, -5.0, "SIDEWAYS") // future, bad close, bad value
  ).toDF("symbol", "trade_date", "high_price", "low_price", "close_price", "sig")
    .withColumn("trade_date", to_date($"trade_date"))

  describe("audit") {
    it("counts every check's violations in one pass, matching the row-level view") {
      val checks = notNull("symbol") ++ Seq(
        between("close_price", 0.01, 1000000),
        acceptedValues("sig", Seq("GOLDEN_CROSS", "DEATH_CROSS", "NEUTRAL")),
        highNotBelowLow,
        noFutureTrades(lit("2024-12-31").cast("date")))
      val row = audit(bars, checks).collect().head
      assert(row.getAs[Long]("row_count") == 4)
      assert(row.getAs[Long]("not_null_symbol") == 1)
      assert(row.getAs[Long]("between_close_price") == 1)
      assert(row.getAs[Long]("accepted_values_sig") == 1)
      assert(row.getAs[Long]("high_not_below_low") == 1)
      assert(row.getAs[Long]("no_future_trades") == 1)
      // single-pass counts agree with the per-check violating-rows view
      checks.foreach { c =>
        assert(violations(bars, c).count() == row.getAs[Long](c.name), c.name)
      }
    }
    it("null values fail only not_null, not the guarded checks") {
      val df = Seq((null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
        .toDF("sig", "close_price")
      val row = audit(df, Seq(
        between("close_price", 0.01, 100),
        acceptedValues("sig", Seq("A")),
        notNull("close_price").head)).collect().head
      assert(row.getAs[Long]("between_close_price") == 0)
      assert(row.getAs[Long]("accepted_values_sig") == 0)
      assert(row.getAs[Long]("not_null_close_price") == 1)
    }
  }

  describe("duplicateKeys") {
    it("finds composite-key duplicates only") {
      val dups = duplicateKeys(bars.select($"symbol", lit("2024-01-02").as("d")), Seq("symbol", "d"))
      assert(dups.count() == 1) // AAPL appears twice
    }
  }

  describe("enforce") {
    it("throws on error-severity violations, naming the failed checks") {
      val e = intercept[IllegalStateException] {
        enforce(bars, notNull("symbol"))
      }
      assert(e.getMessage.contains("not_null_symbol=1"))
    }
    it("does not throw when only warn-severity checks fail") {
      val results = enforce(bars, Seq(between("close_price", 0.01, 1000000, Warn)))
      assert(results.exists(r => r.name == "between_close_price" && r.violations == 1))
    }
    it("throws on duplicate unique keys") {
      val dup = bars.withColumn("trade_date", lit("2024-01-02"))
      val e = intercept[IllegalStateException] {
        enforce(dup.filter($"symbol" === "AAPL"), notNull("symbol"), Seq(Seq("symbol", "trade_date")))
      }
      assert(e.getMessage.contains("unique_symbol_trade_date"))
    }
    it("passes a clean mart end-to-end with the reference's suite") {
      val perf = graft.operators.DailyAnalytics.martStockPerformance(
        graft.sources.Adapters.dailyBars(spark, "/root/testdata/sf0.001"))
      val results = enforce(perf, martStockPerformanceChecks)
      assert(results.forall(r => r.severity == "warn" || r.violations == 0))
    }
  }

  describe("streamWindowIntegrity") {
    it("flags inverted or zero-length windows") {
      val w = Seq(
        ("A", "2024-01-01 10:00:00", "2024-01-01 10:15:00", 15L),
        ("B", "2024-01-01 10:15:00", "2024-01-01 10:00:00", 15L),
        ("C", "2024-01-01 10:00:00", "2024-01-01 10:15:00", 0L))
        .toDF("symbol", "window_start_at", "window_end_at", "window_duration_minutes")
        .withColumn("window_start_at", to_timestamp($"window_start_at"))
        .withColumn("window_end_at", to_timestamp($"window_end_at"))
      assert(violations(w, streamWindowIntegrity)
        .select($"symbol").as[String].collect().sorted.toSeq == Seq("B", "C"))
    }
    it("is null-tolerant: NULL bounds are notNull's concern, not a violation here") {
      val w = Seq(
        ("N1", None, Some("2024-01-01 10:15:00"), Some(15L)),
        ("N2", Some("2024-01-01 10:00:00"), None, Some(15L)),
        ("N3", Some("2024-01-01 10:00:00"), Some("2024-01-01 10:15:00"), None))
        .toDF("symbol", "window_start_at", "window_end_at", "window_duration_minutes")
        .withColumn("window_start_at", to_timestamp($"window_start_at"))
        .withColumn("window_end_at", to_timestamp($"window_end_at"))
      assert(violations(w, streamWindowIntegrity).isEmpty)
    }
  }
}
