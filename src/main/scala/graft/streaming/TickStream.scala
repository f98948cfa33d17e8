package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.operators.TickAnalytics
import graft.sources.Schemas

/** Structured Streaming form of the realtime lane.
  *
  * The reference emulates streaming with a 30-minute Airflow loop that
  * re-reads the ENTIRE raw prefix and recomputes every window
  * (spark_stream_batch_processor.py:36-37, stock_market_stream_dag.py:25)
  * — O(history) work per run, no late-data policy. This is the same
  * logical computation as incremental Structured Streaming:
  *
  *   - one shared aggregation core ([[TickAnalytics.windowAggregates]])
  *     is used by BOTH the batch recompute (exact reference semantics,
  *     used for golden tests) and this watermarked streaming job —
  *     SURVEY §7.4 risk 6;
  *   - `withWatermark` bounds state: windows finalize and are evicted
  *     `watermark` after their end, giving a defined late-data policy
  *     where the reference had implicit full-recompute semantics;
  *   - append output mode + checkpointing makes the parquet sink
  *     exactly-once per window instead of the reference's duplicate
  *     windows across runs (SURVEY §2.8).
  *
  * At scale: state lives in the state store keyed by (symbol, window);
  * tumbling windows mean one state row per key, and partial aggregation
  * happens before the shuffle, so the stateful stage sees pre-reduced
  * rows, not raw ticks.
  */
object TickStream {

  /** readStream over the raw CSV landing zone (same layout/schema as
    * the batch reader — S1's streaming twin). `maxFilesPerTrigger`
    * bounds micro-batch size for backpressure. */
  def rawTickStream(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(Schemas.rawTick)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(path)

  /** Watermarked 15-minute window aggregation over a (streaming or
    * batch) canonical tick frame. */
  def windowed(ticks: DataFrame, duration: String = "15 minutes",
               watermark: String = "30 minutes"): DataFrame =
    TickAnalytics.windowAggregates(
      ticks.withWatermark("event_time", watermark), duration)

  /** Append-mode parquet writer with checkpointing (the reference's
    * processed/realtime sink, S3, made exactly-once). */
  def toParquet(windows: DataFrame, outPath: String,
                checkpoint: String): DataStreamWriter[Row] =
    windows.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
