package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the reference's raw zone (SURVEY §2.1).
  *
  * Hive-style partition paths (`raw/historical/year=/month=/day=/`)
  * are discovered by Spark's file index, so date-range predicates
  * prune whole directories before any byte is read — at 100 TB that
  * partition pruning, plus the explicit schema (no inference scan),
  * is the difference between touching one day and the whole lake.
  */
object RawSources {

  /** S1 — raw historical bars: CSV, explicit schema, header. */
  def rawDailyBars(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawDailyBar).option("header", "true").csv(path)

  /** S1 — raw realtime ticks: CSV, explicit schema, header. */
  def rawTicks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawTick).option("header", "true").csv(path)

  /** S9 — seed dimension CSV (header, tiny ⇒ broadcast at use site). */
  def tickerDim(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.tickerDim).option("header", "true").csv(path)

  /** S4/S5 — the Kafka wire shape: JSON value keyed by symbol. In a
    * cluster deployment the frame comes from
    * `spark.read/readStream.format("kafka")`; this parses the same
    * `value` payload, so the bronze job is source-agnostic. */
  def fromKafkaJson(raw: DataFrame, valueCol: String): DataFrame =
    Kafka.fromJson(raw, Schemas.rawTick, valueCol)

  /** S4 — serialize to the Kafka wire shape (key = symbol, value =
    * JSON of all fields), mirroring batch_data_producer.py:54-63. */
  def toKafkaJson(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))
}
