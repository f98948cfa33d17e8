package graft

import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Enrichment}
import graft.sources.Adapters

/** Physical-plan properties the scale design depends on — asserted, not
  * hoped for. */
class PlanSpec extends AnyFunSpec {
  import SharedSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  describe("physical plans") {
    it("dim enrichment joins broadcast — the fact side never shuffles for the join") {
      val p = plan(Enrichment.revenueByNation(spark, dir))
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("SortMergeJoin"))
    }

    it("token rarity resolves the Zipf head map-side and reuses the docFreq exchange") {
      val df = SparkEntry.queries("q_token_rarity")(spark, dir)
      df.collect() // AQE reuse is a runtime (stage-cache) property — materialize first
      val fin = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      // hot head resolved by broadcast equi + broadcast anti join — the
      // Zipf head never takes a shuffle join
      assert(fin.contains("BroadcastHashJoin") && fin.contains("LeftAnti"),
        s"expected broadcast hot-head joins, plan:\n$fin")
      // the docFreq aggregate's exchange is materialized once and reused
      assert(fin.contains("ReusedExchange"), s"expected ReusedExchange, plan:\n$fin")
    }

    it("per-key cap limits map-side before the shuffle (WindowGroupLimit)") {
      val p = plan(SparkEntry.queries("q_source_cap")(spark, dir))
      assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit, plan:\n$p")
    }

    it("grouped top-k ranks push down (WindowGroupLimit before the exchange)") {
      val p = plan(SparkEntry.queries("q_topk_per_group")(spark, dir))
      assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit, plan:\n$p")
    }

    it("tf-idf joins the tiny df/N frames by broadcast — the token stream never sort-merges") {
      val p = plan(SparkEntry.queries("q_tfidf_search")(spark, dir))
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"expected broadcast joins, plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin, plan:\n$p")
    }

    it("vocab coverage joins the top-k vocabulary by broadcast — the token stream never sort-merges") {
      val p = plan(SparkEntry.queries("q_vocab_coverage")(spark, dir))
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast vocab join, plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin, plan:\n$p")
    }

    it("triangle closure is a left-semi equi join — no nested-loop join in the wedge plan") {
      val p = plan(SparkEntry.queries("q_triangles")(spark, dir))
      assert(p.contains("LeftSemi"), s"expected LeftSemi closure, plan:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"unexpected nested-loop join, plan:\n$p")
    }

    it("snapshot diff compares hashes, not rows: the full-outer join carries key + one long per side") {
      val base = graft.sources.Tables.orders(spark, dir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val p = plan(graft.operators.Versioning.snapshotDiff(
        base, base, Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus")))
      assert(p.contains("FullOuter"), s"expected a full-outer join, plan:\n$p")
      // the compared columns collapse to __h_* in the scan-stage
      // projection (below the exchange)...
      assert(p.contains("AS __h_old") && p.contains("AS __h_new"),
        s"expected scan-stage hash projections, plan:\n$p")
      // ...and the join OUTPUT (the status projection) carries only the
      // key + hashes — the wide columns never cross the exchange
      val outLine = p.linesIterator.find(_.contains("CASE WHEN isnull")).getOrElse("")
      assert(outLine.nonEmpty && !outLine.contains("o_totalprice"),
        s"wide column crossed the join, plan:\n$p")
    }

    it("cohort retention proves membership with a semi join (no payload forwarded)") {
      val p = plan(SparkEntry.queries("q_retention")(spark, dir))
      assert(p.contains("LeftSemi"), s"expected a LeftSemi join, plan:\n$p")
    }

    it("a selective shuffle join injects a runtime bloom filter on the fact side") {
      // the 100 TB behavior this pins: when a dim side is filtered hard
      // but too big to broadcast, Catalyst builds a bloom filter from it
      // at runtime and pushes membership into the fact scan — rows that
      // cannot join never leave the scan stage
      import org.apache.spark.sql.functions._
      val saved = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        .map(k => k -> util.Try(spark.conf.get(k)).toOption).toMap
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        val li = graft.sources.Tables.lineitem(spark, dir)
        val ord = graft.sources.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 500000)
        val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity"))
        assert(j.queryExecution.optimizedPlan.toString.contains("bloom_filter"),
          "expected a runtime bloom filter in the optimized plan")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    it("SCD2 compaction feeds every window frame from ONE exchange — no groupBy re-shuffle") {
      val df = SparkEntry.queries("q_scd2")(spark, dir)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
      assert(exchanges == 1, s"expected 1 exchange, plan:\n${plan(df)}")
      assert(!plan(df).contains("HashAggregate"), // runs collapse by filter+lead, not agg
        s"expected no aggregation, plan:\n${plan(df)}")
    }

    it("tier summary never plans an unpartitioned window over the key table") {
      // tierSummary's ranking must stay distributed: every WindowExec is
      // either partitioned (the per-range-partition row_number) or runs
      // over the partitions-sized __pid offset table — a 10⁹-key input
      // must never funnel through one ntile task (r8 verdict watch item).
      val df = SparkEntry.queries("q_ntile_deciles")(spark, dir)
      // pre-adaptive physical plan: AQE wraps finished stages in leaf
      // QueryStageExec nodes that hide their subtree from collect()
      val windows = df.queryExecution.sparkPlan.collectWithSubqueries {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        val inputCols = w.child.output.map(_.name).toSet
        assert(w.partitionSpec.nonEmpty || inputCols.subsetOf(Set("__pid", "__pn", "__off")),
          s"unpartitioned window over ${inputCols.mkString(",")} — key-table total order")
      }
    }

    it("temperature mixture is a narrow filter — no hash exchange anywhere") {
      // thresholds are plan-time literals from the driver-side count
      // collect; membership must stay a scan-local filter (the only
      // exchange is the final presentation sort)
      val p = plan(SparkEntry.queries("q_temperature_mixture")(spark, dir))
      assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    }

    it("column profile pays exactly one Expand for its exact multi-distinct") {
      val p = plan(SparkEntry.queries("q_column_profile")(spark, dir))
      assert("Expand".r.findAllIn(p).size == 1, s"expected 1 Expand:\n$p")
    }

    it("GROUPING SETS is one pass: a single Expand feeds one aggregation, dims broadcast") {
      val p = plan(Enrichment.revenueGroupingSets(spark, dir))
      assert("Expand".r.findAllIn(p).size == 1, s"expected 1 Expand:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"fact side must not sort-merge:\n$p")
    }

    it("Mann-Kendall pairs stay an equi join inside the bounded tail (no nested loop)") {
      val p = plan(SparkEntry.queries("q_mann_kendall")(spark, dir))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"pair join must be symbol-keyed:\n$p")
    }

    it("decile backtest windows are all partitioned (no global sort over the panel)") {
      val df = SparkEntry.queries("q_decile_backtest")(spark, dir)
      val windows = df.queryExecution.sparkPlan.collectWithSubqueries {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window over ${w.child.output.map(_.name).mkString(",")}"))
    }

    it("exact percentiles combine map-side (partial_percentile buffers, not raw rows)") {
      val p = plan(SparkEntry.queries("q_quantiles")(spark, dir))
      assert(p.contains("ObjectHashAggregate") && p.contains("partial_percentile"),
        s"expected partial percentile aggregation, plan:\n$p")
    }

    it("calendar RANGE window shares the bars exchange — no extra shuffle for the frame") {
      val df = DailyAnalytics.calendarRolling(Adapters.dailyBars(spark, dir))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
      // 1 for the bars aggregation, 1 for the symbol window partitioning
      assert(exchanges == 2, s"expected 2 exchanges, plan:\n${plan(df)}")
    }

    it("sector mart joins the ticker dim by broadcast") {
      val p = plan(SparkEntry.queries("q_mart_sector_summary")(spark, dir))
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("SortMergeJoin"))
    }

    it("pricing filter reaches the parquet scan (PushedFilters)") {
      val p = plan(SparkEntry.queries("q_pricing_summary")(spark, dir))
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    }

    it("the fixed eval panel's cap reaches the embeddings scan (PushedFilters)") {
      // the panel predicate (vec_id % 50 = 0 AND vec_id < 500) is what
      // keeps brute-force eval linear in the corpus — the CAP must
      // prune at the scan, not post-scan (the modulus can't push down,
      // the range can and does)
      val p = plan(SparkEntry.queries("q_sim_topk")(spark, dir))
      assert(p.contains("LessThan(vec_id,500)"),
        "vec_id < 500 did not reach the parquet scan:\n" + p.take(2000))
    }

    it("the pair-join block dial follows the measured regimes") {
      // 1 while the unblocked key space is map-side; 4 at sf0.1's
      // S=1000 (B=2 measured ~45% slower — too few join groups); 8 at
      // the 10x composite's S=10,000 (composite-probe-validated)
      assert(DailyAnalytics.pairBlocks(100) == 1)
      assert(DailyAnalytics.pairBlocks(512) == 1)
      assert(DailyAnalytics.pairBlocks(1000) == 4)
      assert(DailyAnalytics.pairBlocks(10000) == 8)
      assert(DailyAnalytics.pairBlocks(1000000) == 8) // capped
    }

    it("the fused mart computes all window frames over ONE exchange") {
      val df = DailyAnalytics.martStockPerformance(Adapters.dailyBars(spark, dir))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
      // 1 for the bars aggregation, 1 for the symbol window partitioning
      assert(exchanges == 2, s"expected 2 exchanges, plan:\n${plan(df)}")
    }

    it("market beta joins the day-index dim by broadcast — the panel never sort-merges") {
      val p = plan(DailyAnalytics.marketBeta(
        DailyAnalytics.dailyReturns(Adapters.dailyBars(spark, dir))))
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast index join, plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin, plan:\n$p")
    }

    it("weekly resample is one partial-aggregable hash agg over the bars agg") {
      val df = DailyAnalytics.resampleOhlc(Adapters.dailyBars(spark, dir))
      val p = plan(df)
      // 1 exchange for the bars grain, 1 for the (symbol, period) regroup
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 2, s"expected 2 exchanges, plan:\n$p")
      assert(p.contains("partial_min_by") || p.contains("ObjectHashAggregate"),
        s"expected map-side min_by/max_by partials, plan:\n$p")
    }

    it("OBV and stochastic feed their window frames from ONE symbol exchange") {
      for (df <- Seq(
          DailyAnalytics.obv(DailyAnalytics.dailyReturns(Adapters.dailyBars(spark, dir))),
          DailyAnalytics.stochastic(Adapters.dailyBars(spark, dir)))) {
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
        // 1 for the bars aggregation, 1 for the symbol window partitioning
        assert(exchanges == 2, s"expected 2 exchanges, plan:\n${plan(df)}")
      }
    }

    it("EMA/MACD folds collect map-side (partial collect_list, one exchange)") {
      for (df <- Seq(DailyAnalytics.emaClose(Adapters.dailyBars(spark, dir)),
                     DailyAnalytics.macd(Adapters.dailyBars(spark, dir)))) {
        val p = plan(df)
        val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
        assert(exchanges == 2, s"expected 2 exchanges, plan:\n$p")
        assert(p.contains("partial_collect_list") || p.contains("ObjectHashAggregate"),
          s"expected partial collect_list, plan:\n$p")
      }
    }

    it("int8 quantization is a pure narrow map — zero exchanges") {
      val df = graft.operators.Similarity.quantizeInt8(
        graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding")
      assert(!plan(df).contains("Exchange"), s"unexpected exchange, plan:\n${plan(df)}")
    }

    it("hard-negative mining broadcasts the query side and pushes the rank down") {
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val p = plan(graft.operators.Similarity.hardNegatives(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0),
        "vec_id", "embedding", k = 5, dupThreshold = 0.4))
      assert(p.contains("BroadcastExchange"), s"query side must broadcast, plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge, plan:\n$p")
      // the dup cut must not defeat the per-query top-k rank pushdown
      assert(p.contains("WindowGroupLimit"), s"expected rank pushdown, plan:\n$p")
    }

    it("the codec lanes (WAV/ADPCM decode, AVI parse) are narrow maps — zero exchanges") {
      // container encode -> parse -> frame features must never shuffle:
      // at 100 TB the decode stage is pure per-partition CPU, and an
      // accidental exchange there would move the raw payload bytes
      val media = graft.sources.Tables.documents(spark, dir)
        .selectExpr("CAST(doc_id AS LONG) AS media_id",
          "unhex(md5(text)) AS payload", "CAST(8000 AS INT) AS sample_rate")
      val wav = graft.operators.Multimodal.wavFrameFeatures(
        graft.operators.Multimodal.toWav(media, "sample_rate"))
      assert(!plan(wav).contains("Exchange"), s"unexpected exchange, plan:\n${plan(wav)}")
      val avi = graft.operators.Multimodal.aviFrameFeatures(
        graft.operators.Multimodal.toAvi(
          media.withColumn("fps", org.apache.spark.sql.functions.lit(24)),
          "fps", width = 4, height = 4))
      assert(!plan(avi).contains("Exchange"), s"unexpected exchange, plan:\n${plan(avi)}")
    }

    it("BPE encode carries the merge table by broadcast — docs never shuffle for it") {
      val p = plan(graft.operators.TextAnalysis.bpeEncode(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text"))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"expected broadcast merges, plan:\n$p")
      assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin, plan:\n$p")
    }

    it("microstructure reuses the (symbol, day) window partitioning for its agg") {
      val df = graft.operators.TickAnalytics.microstructureDaily(
        Adapters.ticks(spark, dir))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
      // 1 for the tick window; the same-key groupBy rides that partitioning
      assert(exchanges == 1, s"expected 1 exchange, plan:\n${plan(df)}")
    }

    it("projection pruning: the mart reads only the columns it needs") {
      val p = plan(DailyAnalytics.martStockPerformance(Adapters.dailyBars(spark, dir)))
      assert(p.contains("l_suppkey") && p.contains("l_extendedprice"))
      assert(!p.contains("l_comment")) // never existed, sanity
      assert(!p.contains("l_partkey")) // exists in the table, must be pruned
    }

    it("bucketed tables join without any exchange (co-located join)") {
      import graft.sources.{Sinks, Tables}
      Seq("orders_b", "lineitem_b").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists) org.apache.commons.io.FileUtils.deleteDirectory(loc)
      }
      Sinks.writeBucketed(Tables.orders(spark, dir), "orders_b", "o_orderkey", 4)
      Sinks.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      // at test scale AQE would (rightly) broadcast; disable it to
      // observe the bucketed fact↔fact shape that matters at 100 TB
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("lineitem_b")
          .join(spark.table("orders_b"),
            org.apache.spark.sql.functions.col("l_orderkey") ===
              org.apache.spark.sql.functions.col("o_orderkey"))
        joined.collect()
        val p = plan(joined)
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
        assert(!p.contains("Exchange hashpartitioning"),
          s"bucketed join must not re-shuffle:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }

    it("banded near-dup candidates go through equi joins only — no nested-loop anywhere") {
      val df = SparkEntry.queries("q_sim_near_dup")(spark, dir)
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"banded plan must not contain an all-pairs join:\n$p")
    }

    it("IVF's candidate join is an equi join on the cell id") {
      val df = SparkEntry.queries("q_sim_ivf")(spark, dir)
      val p = plan(df)
      assert(p.contains("cell"), "cell key must appear as a join key")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    }

    it("the quality audit is one aggregate over one scan — no shuffle-heavy per-check plans") {
      val df = SparkEntry.queries("q_quality_audit")(spark, dir)
      // a single global aggregate: exactly one row, and the plan has no join at all
      val p = plan(df)
      assert(!p.contains("Join"), s"audit must not join:\n$p")
      assert(df.count() == 1)
    }

    it("the dedup spread uses the explicit partition count (AQE must not coalesce it away)") {
      import graft.operators.Dedup
      import graft.sources.Tables
      val pairs = Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text")
      pairs.collect() // finalize adaptive plan
      val p = plan(pairs)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"spreadById must pin the partition count:\n$p")
    }

    it("whole-stage codegen covers the scan-to-aggregate path") {
      val df = SparkEntry.queries("q_pricing_summary")(spark, dir)
      df.collect() // finalize the adaptive plan; codegen nodes appear in the executed plan
      // "*(n) " prefixes mark whole-stage-codegen stages in the plan tree
      assert(plan(df).contains("*(1) ") || plan(df).contains("*(2) "))
    }

    it("native winnowing emits fingerprints in the scan — no window, no exchange") {
      // the registered query snapshots the fingerprint frame (hiding
      // its producer), so pin the producing stage directly: the whole
      // winnow is one narrow projection over the file scan
      import org.apache.spark.sql.functions._
      val df = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          call_function("winnow_fps", split(col("text"), " "), lit(4), lit(4)))
      val p = plan(df)
      assert(p.contains("winnow_fps"), s"expected the native expression, plan:\n$p")
      assert(!p.contains("Window") && !p.contains("Exchange"),
        s"winnow must stay narrow:\n$p")
    }

    it("DP counts are one partial-aggregable pass — the noise adds no exchange") {
      val p = plan(SparkEntry.queries("q_dp_counts")(spark, dir))
      // one shuffle for the group-by; the threshold-count noise is a
      // plan-time literal expression, so exactly one Exchange appears
      assert("Exchange".r.findAllIn(p).length <= 2, s"plan:\n$p") // agg + final sort
    }

    it("the KS statistic never shuffles event-grain rows after the per-value reduction") {
      val df = SparkEntry.queries("q_ks_test")(spark, dir)
      df.collect()
      // the value-dimension cumsum is a single-partition window over
      // the REDUCED per-value frame; the panel reduces first
      val p = plan(df)
      assert(p.contains("HashAggregate"), s"plan:\n$p")
    }
    it("HITS rounds are equi joins — the only nested loop is the 1-row totals broadcast") {
      val p = plan(SparkEntry.queries("q_hits")(spark, dir))
      assert(!p.contains("CartesianProduct"), s"unexpected CartesianProduct, plan:\n$p")
      // the share division crosses ONE 1-row aggregate by broadcast —
      // every message-passing round must stay an equi join
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
        s"expected at most the scalar-totals cross, plan:\n$p")
    }

    it("Adamic-Adar wedges and sparse-cosine postings stay equi-join only") {
      Seq("q_link_predict", "q_sparse_cosine").foreach { q =>
        val p = plan(SparkEntry.queries(q)(spark, dir))
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$q grew a nested-loop join:\n$p")
      }
    }

    it("market-index joins (kendall/dimson/tracking) broadcast the day dimension") {
      Seq("q_kendall_market", "q_dimson_beta", "q_tracking_error").foreach { q =>
        val p = plan(SparkEntry.queries(q)(spark, dir))
        assert(p.contains("BroadcastHashJoin"), s"$q expected broadcast index join:\n$p")
      }
    }

    it("the wavelet lane is pure window arithmetic — no join of any kind") {
      val p = plan(SparkEntry.queries("q_audio_wavelet")(spark, dir))
      assert(!p.contains("Join"), s"wavelet must stay join-free:\n$p")
    }

    it("range volatility and Page-Hinkley reduce scan-to-aggregate with no join") {
      Seq("q_range_vol", "q_page_hinkley").foreach { q =>
        val p = plan(SparkEntry.queries(q)(spark, dir))
        assert(!p.contains("Join"), s"$q must stay join-free:\n$p")
        assert(p.contains("HashAggregate") || p.contains("Window"), s"plan:\n$p")
      }
    }

    it("VPIN pays exactly ONE tick exchange: windows and both rollups share hash(symbol)") {
      // the tick-rule window partitions by symbol; the bucket rollup's
      // (symbol, bucket) clustering and the final (symbol) rollup are
      // both satisfied by that same layout (subset co-partitioning) —
      // at 100 TB of ticks the operator moves the data ONCE
      val p = plan(SparkEntry.queries("q_vpin")(spark, dir))
      assert(!p.contains("Join"), s"VPIN must stay join-free:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"VPIN expected 1 exchange, got $exchanges:\n$p")
    }

    it("the otsu/morphology raster lanes stay join-free window arithmetic") {
      Seq("q_image_otsu", "q_image_morphology").foreach { q =>
        val p = plan(SparkEntry.queries(q)(spark, dir))
        assert(!p.contains("Join"), s"$q must stay join-free:\n$p")
      }
    }

    it("cramers_v broadcasts its dims; the fact side rollups are hash aggregates") {
      val p = plan(SparkEntry.queries("q_cramers_v")(spark, dir))
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$p")
      assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    }

    it("HHI is one partial-aggregable rollup — no window, no join") {
      val p = plan(SparkEntry.queries("q_hhi")(spark, dir))
      assert(!p.contains("Join") && !p.contains("Window"), s"plan:\n$p")
      assert(p.contains("HashAggregate"), s"plan:\n$p")
    }

    it("k-truss rounds stay on the degree-oriented wedge join — semi closure, no nested loop") {
      val p = plan(SparkEntry.queries("q_ktruss")(spark, dir))
      assert(p.contains("LeftSemi"), s"expected LeftSemi closure, plan:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"unexpected nested-loop join, plan:\n$p")
    }

    it("url canonicalization rides the documents scan — regexps below every exchange") {
      val p = plan(SparkEntry.queries("q_url_dedup")(spark, dir))
      assert(!p.contains("Join") && !p.contains("Window"), s"plan:\n$p")
      // the canonicalization projection must sit in the scan stage:
      // in the printed tree (parents first) that means the regexp
      // project appears BELOW the bottom-most exchange
      val lastEx = p.lastIndexOf("Exchange")
      val rex = p.indexOf("regexp_replace")
      assert(rex >= 0 && rex > lastEx,
        s"canonicalization left the scan stage:\n$p")
    }

  }
}
