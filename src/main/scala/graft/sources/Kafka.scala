package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Kafka connector wiring for the reference's ingestion front: the
  * batch lane produces/consumes daily bars as JSON keyed by symbol
  * (batch_data_producer.py:54-63, batch_data_consumer.py:43-72), and
  * the stream lane does the same for ticks.
  *
  * Structure: [[source]]/[[batchSource]]/[[sink]] hold ALL connector
  * configuration (`format("kafka")` + options), while the codecs
  * ([[decodeTicks]]/[[decodeBars]]/[[RawSources.toKafkaJson]]) work on
  * any frame with the Kafka wire columns — the real connector, a
  * MemoryStream in tests, or a parquet capture. The bronze jobs
  * compose codec ∘ source, so swapping the transport never touches
  * query logic. (The spark-sql-kafka connector jar ships separately
  * from Spark core; in environments without it, [[source]] fails at
  * `load()` with "Failed to find data source: kafka" — the builders
  * are still the single place the jar plugs in.)
  */
object Kafka {

  /** Connection + topic + flow-control options, injected by the
    * caller (the reference reads these from env vars in its scripts). */
  final case class KafkaConfig(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      failOnDataLoss: Boolean = true,
      maxOffsetsPerTrigger: Option[Long] = None,
      extra: Map[String, String] = Map.empty)

  /** Streaming source: one row per record with the Kafka wire columns
    * (key/value binary, topic, partition, offset, timestamp).
    * `maxOffsetsPerTrigger` is the backpressure bound — at cluster
    * scale it caps micro-batch size the way `maxFilesPerTrigger` does
    * for file sources. */
  def source(spark: SparkSession, cfg: KafkaConfig): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("failOnDataLoss", cfg.failOnDataLoss.toString)
    val r2 = cfg.maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
    cfg.extra.foldLeft(r2) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Batch source over an offset range — the consumer-loop shape of
    * batch_data_consumer.py as one bounded read. */
  def batchSource(spark: SparkSession, cfg: KafkaConfig,
                  endingOffsets: String = "latest"): DataFrame = {
    val r = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("endingOffsets", endingOffsets)
    cfg.extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Streaming sink: serializes to the wire shape (key = `keyCol`,
    * value = JSON of every column — batch_data_producer.py:54-63) and
    * writes to the topic with checkpointed exactly-once-per-batch
    * semantics. */
  def sink(df: DataFrame, cfg: KafkaConfig, checkpoint: String,
           keyCol: String): DataStreamWriter[Row] =
    RawSources.toKafkaJson(df, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
      .option("checkpointLocation", checkpoint)

  /** Batch sink: the bounded producer-loop shape of
    * batch_data_producer.py:54-63 as ONE write — serialize to the wire
    * shape and publish. Used by the env-gated broker smoke test
    * (KafkaSpec) and any backfill job replaying a capture table. */
  def batchSink(df: DataFrame, cfg: KafkaConfig, keyCol: String): Unit = {
    val w = RawSources.toKafkaJson(df, keyCol).write
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", cfg.topic)
    cfg.extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }

  /** Generic wire decode: JSON `value` → typed columns. Works on any
    * frame with a castable value column (connector, MemoryStream,
    * capture table). Malformed payloads become null structs — filter
    * or quarantine downstream, don't fail the stream. */
  def fromJson(frame: DataFrame, schema: StructType, valueCol: String = "value"): DataFrame =
    frame.select(from_json(col(valueCol).cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** Tick wire decode (stream lane). */
  def decodeTicks(frame: DataFrame): DataFrame = fromJson(frame, Schemas.rawTick)

  /** Daily-bar wire decode (batch lane — the consumer's payload
    * fields, batch_data_producer.py:33-41). */
  def decodeBars(frame: DataFrame): DataFrame = fromJson(frame, Schemas.rawDailyBar)
}
