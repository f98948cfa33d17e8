package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators._

/** Operators must degrade to empty output (not errors) on empty input —
  * at 100 TB some partition, day, or symbol will always be empty. */
class EmptyInputSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private lazy val emptyBars = Seq.empty[(Long, java.sql.Date, Double, Double, Double, Double, Long)]
    .toDF("symbol", "trade_date", "open_price", "high_price", "low_price", "close_price", "volume")
  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  describe("empty inputs") {
    it("daily analytics chain yields empty marts") {
      val perf = DailyAnalytics.martStockPerformance(emptyBars)
      assert(perf.isEmpty)
      assert(DailyAnalytics.martDailySummary(perf).isEmpty)
    }
    it("dedup operators yield empty pair sets") {
      assert(Dedup.minhashLshPairs(emptyDocs, "doc_id", "text").isEmpty)
      assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").isEmpty)
      assert(Dedup.simhashPairs(emptyDocs, "doc_id", "text").isEmpty)
    }
    it("docs below the shingle size produce no pairs but don't crash") {
      val tiny = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
      assert(Dedup.minhashLshPairs(tiny, "doc_id", "text").isEmpty)
      assert(Dedup.ngramJaccardPairs(tiny, "doc_id", "text").isEmpty)
    }
    it("tick analytics on zero ticks") {
      val emptyTicks = Seq.empty[(String, java.sql.Timestamp, Double, Long)]
        .toDF("symbol", "event_time", "price", "volume")
      assert(TickAnalytics.realtimeAnalytics(emptyTicks).isEmpty)
    }
  }
}
