package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{BatchCleaner, TickAnalytics}
import graft.sources.{Kafka, RawSources}
import graft.sources.Kafka.KafkaConfig

/** The Kafka ingestion front (S4/S5) end to end WITHOUT a broker: the
  * codecs are connector-agnostic, so a MemoryStream carrying the exact
  * wire shape (key = symbol, value = JSON — batch_data_producer.py:
  * 54-63) drives the same path the connector source feeds. */
class KafkaSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val tickJson = Seq(
    """{"symbol":"AAPL","timestamp":"2024-01-01 10:00:00","price":10.0,"open":10.0,"high":10.5,"low":9.5,"volume":1}""",
    """{"symbol":"AAPL","timestamp":"2024-01-01 10:05:00","price":12.0,"open":10.0,"high":12.5,"low":9.5,"volume":2}""",
    """{"symbol":"MSFT","timestamp":"2024-01-01 10:02:00","price":50.0,"open":50.0,"high":50.5,"low":49.5,"volume":1}""")

  describe("wire codecs") {
    it("producer shape → decode is lossless for ticks") {
      val ticks = Seq(("AAPL", "2024-01-01 10:00:00", 10.0, 10.0, 10.5, 9.5, 1L))
        .toDF("symbol", "timestamp", "price", "open", "high", "low", "volume")
      val wire = RawSources.toKafkaJson(ticks, "symbol")
      assert(wire.columns.toSeq == Seq("key", "value"))
      assert(wire.select("key").as[String].head() == "AAPL")
      val back = Kafka.decodeTicks(wire)
      assert(back.collect().toSeq == ticks.collect().toSeq)
    }
    it("bar payloads decode and clean into canonical daily bars") {
      val barJson = Seq(
        """{"symbol":"aapl","date":"2024-01-02","daily_open":10.0,"daily_high":12.0,"daily_low":9.0,"daily_close":11.0,"daily_volume":1000,"batch_load_timestamp":"2024-01-03T00:00:00"}""",
        """{"symbol":"BAD","date":"2024-01-02","daily_open":1.0,"daily_high":1.0,"daily_low":1.0,"daily_close":-1.0,"daily_volume":10,"batch_load_timestamp":"2024-01-03T00:00:00"}""")
      val clean = BatchCleaner.cleanDailyBars(
        Kafka.decodeBars(barJson.toDF("value")),
        today = lit("2024-12-31").cast("date"))
      assert(clean.count() == 1)
      val row = clean.head()
      assert(row.getAs[String]("symbol") == "AAPL")
      assert(row.getAs[Double]("close_price") == 11.0)
    }
    it("malformed payloads become null rows, not stream failures") {
      val bad = Seq("""not json""", tickJson.head).toDF("value")
      val decoded = Kafka.decodeTicks(bad)
      assert(decoded.count() == 2)
      assert(decoded.filter($"symbol".isNull).count() == 1)
    }
  }

  describe("kafka-shaped streaming path") {
    it("MemoryStream wire frames → decode → clean → windowed agg equals batch") {
      val source = MemoryStream[(String, String)](spark)
      source.addData(tickJson.map(v => ("k", v)): _*)
      val ticks = BatchCleaner.cleanTicks(
        Kafka.decodeTicks(source.toDF().toDF("key", "value")))
      val q = ticks
        .withWatermark("event_time", "30 minutes")
        .transform(df => TickAnalytics.windowAggregates(df, "15 minutes"))
        .writeStream.format("memory").queryName("kafka_win")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()

      val batch = TickAnalytics.windowAggregates(
        BatchCleaner.cleanTicks(Kafka.decodeTicks(tickJson.toDF("value"))),
        "15 minutes")
      val streamed = spark.table("kafka_win").select(batch.columns.map(col): _*)
      assert(streamed.count() == 2) // one 15m window per symbol
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    }
  }

  describe("real broker (env-gated)") {
    // The one seam MemoryStream can't prove: an actual broker round
    // trip. Runs only where KAFKA_BOOTSTRAP points at a live broker
    // AND the spark-sql-kafka connector jar is on the classpath
    // (neither exists in this sandbox — the test self-skips); the
    // suite must stay green both with and without the env var.
    it("bars round-trip produce → consume → decode against a live broker") {
      val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")
      assume(bootstrap.isDefined, "KAFKA_BOOTSTRAP not set — broker smoke skipped")
      val cfg = KafkaConfig(bootstrap.get,
        s"graft_smoke_${System.currentTimeMillis()}")
      val bars = Seq(
        ("AAPL", "2024-01-02", 10.0, 12.0, 9.0, 11.0, 1000L, "2024-01-03T00:00:00"),
        ("MSFT", "2024-01-02", 50.0, 52.0, 49.0, 51.0, 2000L, "2024-01-03T00:00:00"))
        .toDF("symbol", "date", "daily_open", "daily_high", "daily_low",
          "daily_close", "daily_volume", "batch_load_timestamp")
      Kafka.batchSink(bars, cfg, "symbol")
      val back = Kafka.decodeBars(Kafka.batchSource(spark, cfg))
      assert(back.count() == bars.count())
      assert(back.exceptAll(bars).isEmpty && bars.exceptAll(back).isEmpty)
    }
  }

  describe("connector builders") {
    it("source() is fully configured; only the connector jar is environment-dependent") {
      val cfg = KafkaConfig("broker:9092", "ticks", maxOffsetsPerTrigger = Some(10000L))
      try {
        val df = Kafka.source(spark, cfg)
        // connector jar present: the wire columns must be there
        assert(Seq("key", "value", "topic", "partition", "offset")
          .forall(df.columns.contains))
      } catch {
        // connector jar absent (this sandbox): the builder must fail at
        // data-source lookup — i.e. everything up to the jar is wired
        case e: Exception =>
          assert(e.getMessage.toLowerCase.contains("kafka"),
            s"unexpected failure: ${e.getMessage}")
      }
    }
  }
}
