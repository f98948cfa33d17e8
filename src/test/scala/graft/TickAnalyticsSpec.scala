package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.TickAnalytics
import graft.sources.Adapters

/** A1/A2/J1 semantics + the equi-bucket join rewrite's equivalence to
  * the literal interval join, on real testdata. */
class TickAnalyticsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private lazy val ticks = Adapters.ticks(spark, "/root/testdata/sf0.001")

  describe("windowAggregates") {
    it("tumbling windows are 15 minutes wide and aligned") {
      val w = TickAnalytics.windowAggregatesExact(ticks, "15 minutes")
      assert(w.filter(unix_timestamp($"window_end") - unix_timestamp($"window_start") =!= 900).isEmpty)
      assert(w.filter(unix_timestamp($"window_start") % 900 =!= 0).isEmpty)
    }
    it("volume_sum equals tick count (volume := 1 per event)") {
      val total = TickAnalytics.windowAggregatesExact(ticks, "15 minutes")
        .agg(sum("volume_sum")).as[Long].head()
      assert(total == ticks.count())
    }
    it("exact fixed-point aggregation matches the float path after rounding") {
      val ex = TickAnalytics.windowAggregatesExact(ticks, "15 minutes")
        .select("symbol", "window_start", "ma", "volume_sum")
      val fl = TickAnalytics.windowAggregates(ticks, "15 minutes")
        .select("symbol", "window_start", "ma", "volume_sum")
      // ma values agree to 1e-9 (same mean, different summation path)
      val joinedDiff = ex.as("a").join(fl.as("b"), Seq("symbol", "window_start"))
        .filter(abs($"a.ma" - $"b.ma") > 1e-9)
      assert(joinedDiff.isEmpty)
    }
  }

  describe("J1: equi-bucket rewrite vs literal interval join") {
    it("attach identical ma_1h to every 15-minute window") {
      val viaEqui = TickAnalytics.realtimeAnalytics(ticks)
        .select("symbol", "window_start", "ma_1h")
      val m15 = TickAnalytics.windowAggregatesExact(ticks, "15 minutes")
      val h1 = TickAnalytics.windowAggregatesExact(ticks, "1 hour")
        .select(col("symbol"), col("window_start").as("h_start"), col("ma").as("ma_1h"))
      val viaRange = TickAnalytics.intervalJoinLiteral(
        m15, h1, "window_start", "h_start", expr("INTERVAL 1 HOUR"))
        .select(col("symbol"), col("window_start"), col("ma_1h"))
      assert(viaEqui.exceptAll(viaRange).isEmpty && viaRange.exceptAll(viaEqui).isEmpty)
    }
  }

  describe("FIXTURES.md edge cases") {
    it("constant-price windows get volatility 0, singleton windows get NULL, gaps produce no windows") {
      import java.sql.Timestamp
      def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:${m}%02d:00")
      val fixture = Seq(
        ("FLAT", ts(0), 10.0, 1L), ("FLAT", ts(5), 10.0, 1L), ("FLAT", ts(10), 10.0, 1L),
        ("ONE", ts(0), 5.0, 1L),
        // 15-29 empty gap, then a "late"-window burst
        ("FLAT", ts(31), 11.0, 1L), ("FLAT", ts(32), 11.5, 1L))
        .toDF("symbol", "event_time", "price", "volume")
      val w = TickAnalytics.windowAggregatesExact(fixture, "15 minutes")
        .orderBy("symbol", "window_start").collect()
      assert(w.length == 3) // no window emitted for the empty 09:15 slot
      val flat0 = w(0)
      assert(flat0.getAs[Double]("volatility") == 0.0) // constant price, n=3
      val one = w(2)
      assert(one.isNullAt(one.fieldIndex("volatility"))) // n=1 → NULL like stddev_samp
    }
    it("duplicate ticks fold into the window aggregates (reference append-lane semantics)") {
      import java.sql.Timestamp
      val t = Timestamp.valueOf("2024-01-01 09:00:00")
      val dup = Seq(("A", t, 10.0, 1L), ("A", t, 10.0, 1L))
        .toDF("symbol", "event_time", "price", "volume")
      val w = TickAnalytics.windowAggregatesExact(dup, "15 minutes").collect()
      assert(w.length == 1 && w(0).getAs[Long]("volume_sum") == 2)
      // and the dedup operator removes them when that's the intent
      val deduped = graft.operators.Dedup.keepFirst(dup, Seq("symbol", "event_time"),
        Seq(col("price")))
      assert(deduped.count() == 1)
    }
  }

  describe("mart_realtime_signals invariants (assert_stream_window_integrity)") {
    lazy val mart = TickAnalytics.martRealtimeSignals(
      TickAnalytics.realtimeEnriched(
        TickAnalytics.stagingRealtime(
          TickAnalytics.realtimeAnalytics(ticks),
          lit("2024-02-01 00:00:00").cast("timestamp_ntz"))))

    it("window_end > window_start and positive duration") {
      assert(mart.filter($"window_end_at" <= $"window_start_at").isEmpty)
      assert(mart.filter($"window_duration_minutes" =!= 15).isEmpty)
    }
    it("signal domains") {
      assert(mart.filter(!$"momentum_signal".isin("BULLISH", "BEARISH", "NEUTRAL")).isEmpty)
      assert(mart.filter(!$"volatility_regime".isin("LOW", "NORMAL", "ELEVATED", "HIGH")).isEmpty)
    }
    it("multi-signal alert implies its three components") {
      assert(mart.filter($"is_multi_signal_alert" &&
        ($"momentum_signal" === "NEUTRAL" || !$"is_volume_spike")).isEmpty)
    }
  }

  describe("microstructureDaily") {
    it("computes exact realized vol and direction counts on a hand fixture") {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 09:30:00")
      def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
      // moves (cents): +10, -5, 0, +20 -> rv² = 100+25+0+400 = 525
      val fix = Seq(
        ("X", at(0), 10.00, 1L), ("X", at(1), 10.10, 1L),
        ("X", at(2), 10.05, 1L), ("X", at(3), 10.05, 1L),
        ("X", at(4), 10.25, 1L))
        .toDF("symbol", "event_time", "price", "volume")
      val m = TickAnalytics.microstructureDaily(fix).collect().head
      assert(m.getAs[Long]("n_moves") == 4L)
      assert(m.getAs[Long]("upticks") == 2L)
      assert(m.getAs[Long]("downticks") == 1L)
      assert(m.getAs[Long]("zeroticks") == 1L)
      val expRv = math.floor(math.sqrt(525.0) / 100.0 * 10000 + 0.5) / 10000
      assert(m.getAs[Double]("realized_vol") == expRv)
      // imbalance (2-1)/3 = 0.3333
      assert(m.getAs[Double]("tick_imbalance") == 0.3333)
    }
    it("day boundaries reset the lag (no cross-day move)") {
      val fix = Seq(
        ("X", java.sql.Timestamp.valueOf("2024-01-01 23:59:59"), 10.0, 1L),
        ("X", java.sql.Timestamp.valueOf("2024-01-02 00:00:01"), 99.0, 1L))
        .toDF("symbol", "event_time", "price", "volume")
      assert(TickAnalytics.microstructureDaily(fix).isEmpty) // 1 tick/day -> no moves
    }
  }
}
