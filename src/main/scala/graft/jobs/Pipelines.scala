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

  /** Reuse an active session (spark-submit, tests); otherwise build a
    * local one and stop it when done. Never stops a session we didn't
    * create. */
  private def withSession[T](name: String)(f: SparkSession => T): T = {
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse(
      SparkSession.builder()
        .appName(name)
        .master(sys.props.getOrElse("spark.master", "local[*]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .getOrCreate())
    try f(spark) finally if (existing.isEmpty) spark.stop()
  }

  /** stock_market_batch_dag: raw historical CSV → clean bars parquet
    * (spark_process_batch step; the producer/consumer legs are Kafka
    * infrastructure outside the engine). */
  object BatchPipeline {
    def main(args: Array[String]): Unit = {
      val Array(rawPath, outPath) = args.take(2)
      withSession("graft-batch") { spark =>
        val clean = BatchCleaner.cleanDailyBars(RawSources.rawDailyBars(spark, rawPath))
        Sinks.writePartitioned(clean, outPath, "symbol", Seq("trade_date"))
        println(s"bars written: ${spark.read.parquet(outPath).count()}")
      }
    }
  }

  /** stock_streaming_pipeline: raw tick CSV → watermarked 15-minute
    * windows → append parquet, incrementally (vs the reference's
    * full-prefix recompute every 30 minutes). */
  object StreamingPipeline {
    def main(args: Array[String]): Unit = {
      val Array(rawPath, outPath, checkpoint) = args.take(3)
      withSession("graft-stream") { spark =>
        TickStream.configureRocksDbState(spark)
        val ticks = BatchCleaner.cleanTicks(TickStream.rawTickStream(spark, rawPath))
        val q = TickStream.toParquet(TickStream.windowed(ticks), outPath, checkpoint).start()
        q.awaitTermination()
      }
    }
  }

  /** dbt_transformation_pipeline: clean bars → marts → quality gate.
    * The staging→intermediate→mart chain is one lazy plan per mart;
    * the trailing [[graft.quality.Invariants]] stage is the reference's
    * `dbt test` step (dbt_transformation_dag.py:96-108) run against the
    * materialized output, failing the run on error-severity violations. */
  object TransformPipeline {
    import graft.quality.{Freshness, Invariants}

    def main(args: Array[String]): Unit = {
      val Array(barsPath, outDir) = args.take(2)
      withSession("graft-transform") { spark =>
        val bars = spark.read.parquet(barsPath)
        // dbt source-freshness gate (sources.yml:11-14): the batch
        // source must have loaded within 49h, warns past 25h
        if (bars.columns.contains("batch_loaded_at")) {
          val (w, e) = Freshness.batchThresholds
          Freshness.enforce(bars, "batch_loaded_at", current_timestamp(),
            w, e, "processed_daily_bars")
        }
        // singular staging tests run before the marts build, like
        // dbt_test_staging precedes dbt_test_marts in the DAG
        Invariants.enforce(bars, Seq(
          Invariants.highNotBelowLow,
          Invariants.noFutureTrades(current_date())))
        val perf = DailyAnalytics.martStockPerformance(bars, withAudit = true)
        Sinks.writePartitioned(perf, s"$outDir/mart_stock_performance", "symbol", Seq("trade_date"))
        DailyAnalytics.martDailySummary(perf.drop("dbt_updated_at"))
          .withColumn("dbt_updated_at", current_timestamp())
          .write.mode("overwrite").parquet(s"$outDir/mart_daily_summary")
        // mart tests against the materialized tables (what dbt tests)
        Invariants.enforce(
          spark.read.parquet(s"$outDir/mart_stock_performance"),
          Invariants.martStockPerformanceChecks)
        Invariants.enforce(
          spark.read.parquet(s"$outDir/mart_daily_summary"),
          Invariants.martDailySummaryChecks,
          uniqueKeys = Seq(Seq("trade_date")))
      }
    }
  }

  /** The MULTIMODAL training-data DAG — [[CorpusPipeline]]'s shape
    * applied to media: compressed blob archive → per-row decompression
    * with the poison-pill policy (corrupt blobs drop, never fail the
    * job) → WAV container encode (the archive-to-wire step a real
    * pipeline runs once) → container parse + frame decode → energy-VAD
    * curation (keep media with ≥ 1 voiced segment) → frame-level exact
    * dedup by content hash. Every stage is the oracle-checked
    * operator; counts must shrink monotonically (a curation stage that
    * grows its input is a bug, not a statistic); stages snapshot so
    * audits and successors read materialized frames. */
  object MediaPipeline {
    import graft.sources.Staging.Snapshottable

    def main(args: Array[String]): Unit = {
      val Array(blobsPath, outDir) = args.take(2)
      withSession("graft-media") { spark =>
        // 1. ingest: gzip blob archive -> raw payloads; poison pills drop
        val blobs = spark.read.parquet(blobsPath)
        val total = blobs.count()
        val raw = Compression
          .decompressCorpus(blobs, "doc_id", "blob", "orig_len", "gzip")
          .filter(col("ok"))
          .select(col("doc_id").as("media_id"),
            unhex(md5(col("text"))).as("payload"),
            lit(8000).as("sample_rate"))
          .snapshot()
        val nDecoded = raw.count()
        // 2. container encode + 3. parse/decode to frame features
        val frames = Multimodal.wavFrameFeatures(
          Multimodal.toWav(raw, "sample_rate"), frameSamples = 4).snapshot()
        // 4. VAD curation: media with at least one voiced segment
        val segs = Multimodal.energySegments(
          frames.drop("sample_rate", "n_channels"), minFrameEnergy = 1000000000L)
        val voiced = raw.join(
          segs.select("media_id").distinct(), "media_id").snapshot()
        val nVoiced = voiced.count()
        require(nDecoded <= total && nVoiced <= nDecoded,
          s"media stage grew: $total -> $nDecoded -> $nVoiced")
        // 5. frame-level exact dedup on content hash, keep-first
        val uniqueFrames = Dedup.keepFirst(
          Multimodal.sampleFrames(
            Multimodal.asMedia(voiced.select(col("media_id"), col("payload")),
              "media_id", "payload")),
          Seq("frame_hash"), Seq(col("media_id"), col("frame_idx")))
        uniqueFrames.write.mode("overwrite").parquet(s"$outDir/frames")
        voiced.select("media_id").write.mode("overwrite").parquet(s"$outDir/kept")
        val nFrames = spark.read.parquet(s"$outDir/frames").count()
        println(s"[media] total=$total decoded=$nDecoded voiced=$nVoiced " +
          s"unique_frames=$nFrames")
      }
    }
  }

  /** The LLM training-data DAG (the pipeline the LLM-data layer's
    * operators exist to compose): raw document corpus → quality/
    * language gate → near-dup removal (exact dups are Jaccard-1
    * near-dups, so one MinHash pass handles both) → eval-set
    * decontamination → deterministic train/val/test split →
    * concat-and-chunk packing plan for the train split.
    *
    * Every stage is the already-oracle-checked operator, composed
    * lazily — Catalyst sees one plan per output, and each stage's
    * scale shape (banded candidates, broadcast eval shingles, hash
    * splits, sharded packing) is unchanged by composition. Stage
    * counts print as the run's audit trail; the job fails if a stage
    * GROWS the corpus (a dedup/filter stage that adds rows is a bug,
    * not a statistic).
    *
    * Each stage output is snapshotted ([[graft.sources.Staging]]) so
    * its audit count AND the next stage read a materialized frame —
    * without that, every downstream action re-executes the expensive
    * MinHash/decontamination DAG from the scan; the final split report
    * reads the WRITTEN corpus for the same reason. */
  object CorpusPipeline {
    import graft.sources.Staging.Snapshottable

    def main(args: Array[String]): Unit = {
      val Array(docsPath, evalPath, outDir) = args.take(3)
      withSession("graft-corpus") { spark =>
        val docs = spark.read.parquet(docsPath)
        val total = docs.count()
        // 1. quality / language gate (first-failing-gate verdicts)
        val verdicts = TextAnalysis.corpusFilter(docs, "doc_id", "text", "lang")
        val kept = docs.join(
          verdicts.filter(col("keep")).select("doc_id"), "doc_id")
          .snapshot()
        val nKept = kept.count()
        // 2. near-dup removal: keep each group's representative
        val deduped = Dedup.dedupCorpus(kept, "doc_id", "text").snapshot()
        val nDeduped = deduped.count()
        // 3. eval decontamination: drop heavy-overlap docs (docs too
        // short to shingle never appear in the score frame = clean)
        val evalDocs = spark.read.parquet(evalPath)
        val contaminated = Decontamination
          .contaminationScores(deduped, "doc_id", "text", evalDocs, "text")
          .filter(col("overlap_ratio") >= 0.5)
          .select("doc_id")
        val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
          .snapshot()
        val nClean = clean.count()
        require(nKept <= total && nDeduped <= nKept && nClean <= nDeduped,
          s"corpus stage grew: $total -> $nKept -> $nDeduped -> $nClean")
        // 4. deterministic split, stable under corpus growth
        Sampling.withSplit(clean, "doc_id", trainFraction = 0.8,
          valFraction = 0.1)
          .write.mode("overwrite").partitionBy("split")
          .parquet(s"$outDir/corpus")
        // 5. packing plan for the train split (fixed shards: layout
        // reproducibility across runs beats auto-scaling here)
        val written = spark.read.parquet(s"$outDir/corpus")
        val packed = Packing.chunkSpans(
          TextAnalysis.tokenStats(written.filter(col("split") === "train"), "text")
            .select("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget = 2048, shards = 64)
        packed.write.mode("overwrite").parquet(s"$outDir/packing_plan")
        val splits = written.groupBy("split").count().collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
        println(s"[corpus] total=$total kept=$nKept deduped=$nDeduped " +
          s"clean=$nClean splits($splits)")
      }
    }
  }
}
