package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.{RawSources, Sinks}
import graft.streaming.TickStream

/** The reference's three Airflow DAGs (SURVEY §3) as plain sequential
  * Scala mains — DAG edges become function composition, dbt's
  * ephemeral ref-graph becomes lazy DataFrame composition (Catalyst
  * sees the fused plan, exactly like Snowflake saw inlined CTEs).
  *
  * Paths are local directories here; on a cluster they are s3a:// /
  * abfss:// URIs — nothing else changes.
  */
object Pipelines {

  private def session(name: String): SparkSession = SparkSession.builder()
    .appName(name)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()

  /** stock_market_batch_dag: raw historical CSV → clean bars parquet
    * (spark_process_batch step; the producer/consumer legs are Kafka
    * infrastructure outside the engine). */
  object BatchPipeline {
    def main(args: Array[String]): Unit = {
      val Array(rawPath, outPath) = args.take(2)
      val spark = session("graft-batch")
      val clean = BatchCleaner.cleanDailyBars(RawSources.rawDailyBars(spark, rawPath))
      Sinks.writePartitioned(clean, outPath, "symbol", Seq("trade_date"))
      println(s"bars written: ${spark.read.parquet(outPath).count()}")
      spark.stop()
    }
  }

  /** stock_streaming_pipeline: raw tick CSV → watermarked 15-minute
    * windows → append parquet, incrementally (vs the reference's
    * full-prefix recompute every 30 minutes). */
  object StreamingPipeline {
    def main(args: Array[String]): Unit = {
      val Array(rawPath, outPath, checkpoint) = args.take(3)
      val spark = session("graft-stream")
      val ticks = BatchCleaner.cleanTicks(TickStream.rawTickStream(spark, rawPath))
      val q = TickStream.toParquet(TickStream.windowed(ticks), outPath, checkpoint).start()
      q.awaitTermination()
      spark.stop()
    }
  }

  /** dbt_transformation_pipeline: clean bars → marts. The staging→
    * intermediate→mart chain is one lazy plan per mart. */
  object TransformPipeline {
    def main(args: Array[String]): Unit = {
      val Array(barsPath, outDir) = args.take(2)
      val spark = session("graft-transform")
      val bars = spark.read.parquet(barsPath)
      val perf = DailyAnalytics.martStockPerformance(bars, withAudit = true)
      Sinks.writePartitioned(perf, s"$outDir/mart_stock_performance", "symbol", Seq("trade_date"))
      DailyAnalytics.martDailySummary(perf.drop("dbt_updated_at"))
        .withColumn("dbt_updated_at", current_timestamp())
        .write.mode("overwrite").parquet(s"$outDir/mart_daily_summary")
      spark.stop()
    }
  }
}
