package graft

import org.scalatest.funspec.AnyFunSpec

/** End-to-end run of the batch pipeline main (§3 lifecycle): raw CSV
  * landing zone → cleaned, symbol-partitioned parquet. */
class PipelinesSpec extends AnyFunSpec {
  import SharedSpark.spark

  describe("Pipelines.BatchPipeline") {
    it("cleans a raw landing zone into partitioned parquet end-to-end") {
      val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toFile
      val raw = new java.io.File(dir, "raw/year=2024/month=01/day=02")
      raw.mkdirs()
      val w = new java.io.PrintWriter(new java.io.File(raw, "bars.csv"))
      w.println("symbol,date,daily_open,daily_high,daily_low,daily_close,daily_volume,batch_load_timestamp")
      w.println("AAPL,2024-01-02,10,12,9,11,1000,2024-01-03T00:00:00")
      w.println("msft,2024-01-02,20,22,19,21,900,2024-01-03T00:00:00")
      w.println("BAD,2024-01-02,1,1,1,-1,10,2024-01-03T00:00:00")
      w.close()

      val out = new java.io.File(dir, "processed").getAbsolutePath
      graft.jobs.Pipelines.BatchPipeline.main(
        Array(new java.io.File(dir, "raw").getAbsolutePath, out))

      val bars = spark.read.parquet(out)
      assert(bars.count() == 2)
      assert(bars.select("symbol").distinct().collect().map(_.getString(0)).toSet
        == Set("AAPL", "MSFT"))
      // partitioned layout on disk
      assert(new java.io.File(out).listFiles().exists(_.getName == "symbol=AAPL"))
    }
  }

  describe("Pipelines.TransformPipeline") {
    it("builds both marts and passes the freshness + invariants gates end-to-end") {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft_transform").toFile
      val barsPath = new java.io.File(dir, "bars").getAbsolutePath
      // fresh clean bars (loaded now, so the 49h freshness gate passes)
      graft.sources.Adapters.dailyBars(spark, "/root/testdata/sf0.001")
        .withColumn("batch_loaded_at", current_timestamp())
        .write.parquet(barsPath)
      val outDir = new java.io.File(dir, "marts").getAbsolutePath

      graft.jobs.Pipelines.TransformPipeline.main(Array(barsPath, outDir))

      val perf = spark.read.parquet(s"$outDir/mart_stock_performance")
      val summary = spark.read.parquet(s"$outDir/mart_daily_summary")
      assert(perf.count() > 0 && summary.count() > 0)
      assert(perf.columns.contains("rsi_14") && perf.columns.contains("dbt_updated_at"))
      assert(summary.groupBy("trade_date").count().filter(col("count") > 1).isEmpty)
    }

    it("a stale source fails the freshness gate before any mart is built") {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft_transform_stale").toFile
      val barsPath = new java.io.File(dir, "bars").getAbsolutePath
      graft.sources.Adapters.dailyBars(spark, "/root/testdata/sf0.001")
        .withColumn("batch_loaded_at", lit("2020-01-01 00:00:00").cast("timestamp"))
        .write.parquet(barsPath)
      val outDir = new java.io.File(dir, "marts").getAbsolutePath

      val e = intercept[IllegalStateException] {
        graft.jobs.Pipelines.TransformPipeline.main(Array(barsPath, outDir))
      }
      assert(e.getMessage.contains("freshness"))
      assert(!new java.io.File(s"$outDir/mart_stock_performance").exists)
    }
  }
}
