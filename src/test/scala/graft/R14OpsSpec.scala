package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Graph, Multimodal}

/** Golden/invariant coverage for the round-14 operators: the
  * econometrics quartet (Fama–MacBeth, KPSS, ARCH-LM, permutation
  * entropy), the VWAP band and ADX filters, bounded BFS, histogram
  * equalization, and PCM decimation — each pinned on a constructed
  * input whose answer is exact by hand. */
class R14OpsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def returnsDf(rows: Seq[(String, Int, Double)]) =
    rows.toDF("symbol", "day", "daily_return_pct")
      .withColumn("trade_date", date_add(to_date(lit("2024-01-01")), col("day")))
      .drop("day")

  describe("famaMacbeth") {
    it("recovers the exact slope on a noiseless linear panel") {
      // 12 symbols with per-symbol constant returns c_i, scaled by a
      // day-parity multiplier m_d ∈ {1, 2}: the 20-day momentum signal
      // is x = 30·c_i for every full window, so the cross-sectional
      // slope is EXACTLY m_d/30 each day → mean (1.5/30) = 0.05.
      val rows = for {
        i <- 0 until 12
        d <- 0 until 60
      } yield (s"S$i", d, 0.1 * (i + 1) * (if (d % 2 == 0) 1 else 2))
      val out = DailyAnalytics.famaMacbeth(returnsDf(rows)).collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[Long]("n_days") == 40) // days 21..60 have full signals
      assert(r.getAs[Double]("gamma_mean") == 0.05)
      assert(r.getAs[Double]("pct_days_positive") == 1.0)
      assert(r.getAs[Double]("t_stat") > 0.0)
    }
  }

  describe("kpss") {
    it("accepts an alternating series and rejects a deterministic trend") {
      val alt = (0 until 40).map(t => ("ALT", t, if (t % 2 == 0) 1.0 else -1.0))
      val trend = (0 until 40).map(t => ("TRD", t, t * 1.0))
      val out = DailyAnalytics.kpss(returnsDf(alt ++ trend))
        .collect().map(r => r.getAs[String]("symbol") ->
          r.getAs[Boolean]("stationary")).toMap
      assert(out("ALT"))   // partial sums stay bounded → small η
      assert(!out("TRD"))  // trend makes partial sums diverge → big η
    }
  }

  describe("archLm") {
    it("is exactly zero when squared returns have no lag-1 correlation") {
      // q-cycle 1,1,4,4: over full cycles the four (x, q) pair types
      // appear equally often and nΣxq − ΣxΣq = 0 exactly
      val ys = (0 until 41).map { t =>
        ("A", t, if (t % 4 < 2) 0.01 else 0.02)
      }
      val r = DailyAnalytics.archLm(returnsDf(ys)).collect().head
      assert(r.getAs[Long]("n_days") == 40)
      assert(r.getAs[Double]("r2") == 0.0)
      assert(r.getAs[Double]("lm_stat") == 0.0)
      assert(!r.getAs[Boolean]("arch_sig"))
    }
    it("flags a perfectly anti-correlated volatility cycle") {
      // q alternates 1,4,1,4 → lag-1 correlation −1 → R² = 1, LM = n
      val ys = (0 until 41).map(t => ("A", t, if (t % 2 == 0) 0.01 else 0.02))
      val r = DailyAnalytics.archLm(returnsDf(ys)).collect().head
      assert(r.getAs[Double]("r2") == 1.0)
      assert(r.getAs[Boolean]("arch_sig"))
    }
  }

  describe("permutationEntropy") {
    it("is zero on a monotone ramp (single ordinal pattern)") {
      val ys = (0 until 40).map(t => ("A", t, t * 0.5))
      val r = DailyAnalytics.permutationEntropy(returnsDf(ys)).collect().head
      assert(r.getAs[Double]("perm_entropy") == 0.0)
      assert(r.getAs[Double]("max_pattern_share") == 1.0)
    }
    it("is exactly ln 2 on a two-pattern alternation") {
      // ±1 alternation over 40 points → 38 triples, 19 of each of the
      // two patterns → H = ln 2, share 0.5
      val ys = (0 until 40).map(t => ("A", t, if (t % 2 == 0) 1.0 else -1.0))
      val r = DailyAnalytics.permutationEntropy(returnsDf(ys)).collect().head
      assert(r.getAs[Long]("n_triples") == 38)
      assert(r.getAs[Double]("perm_entropy") == 0.693147) // rd(ln 2, 6)
      assert(r.getAs[Double]("max_pattern_share") == 0.5)
    }
  }

  describe("rollingVwap") {
    it("equals the constant price with zero deviation, full windows only") {
      val bars = (0 until 21).map(d => ("A", d, 10.0, (d + 1) * 100L))
        .toDF("symbol", "day", "close_price", "volume")
        .withColumn("trade_date", date_add(to_date(lit("2024-01-01")), col("day")))
        .drop("day")
      val out = DailyAnalytics.rollingVwap(bars).collect()
      assert(out.length == 2) // only days 20 and 21 carry 20 full rows
      out.foreach { r =>
        assert(r.getAs[Double]("vwap_20d") == 10.0)
        assert(r.getAs[Double]("dev_pct") == 0.0)
      }
    }
  }

  describe("adxFilter") {
    it("saturates DX at 100 on a monotone uptrend") {
      val bars = (0 until 35).map(d => ("A", d, 10.0 + d, 9.0 + d))
        .toDF("symbol", "day", "high_price", "low_price")
        .withColumn("trade_date", date_add(to_date(lit("2024-01-01")), col("day")))
        .drop("day")
      val r = DailyAnalytics.adxFilter(bars).collect().head
      assert(r.getAs[Long]("smoothed_dm_minus") == 0L)
      assert(r.getAs[Double]("dx_last") == 100.0)
      val adx = r.getAs[Double]("adx")
      assert(adx > 80.0 && adx <= 100.0) // Wilder state past 33 steps
    }
  }

  describe("bfsHops") {
    it("produces the exact hop histogram with the unreached bucket") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (5L, 6L), (6L, 7L), (100L, 101L)).toDF("u", "v")
      val out = Graph.bfsHops(edges, "u", "v", rounds = 2, nSeeds = 1)
        .collect().map(r => r.getAs[Long]("hops") -> r.getAs[Long]("n_nodes"))
        .toMap
      // seed = node 1; rounds = 2 reaches 2 (1 hop) and 3 (2 hops)
      assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, -1L -> 6L))
    }
  }

  describe("histogramEqualize") {
    it("maps a flat raster to zero and stretches a two-level one to full range") {
      val flat = for (y <- 0 until 8; x <- 0 until 8)
        yield (1L, y.toLong, x.toLong, 200L)
      val twoLevel = for (y <- 0 until 8; x <- 0 until 8)
        yield (2L, y.toLong, x.toLong, if (y < 4) 10L else 250L)
      val px = (flat ++ twoLevel).toDF("media_id", "y", "x", "v")
      val out = Multimodal.histogramEqualize(px)
        .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
      // flat: cdf_min = 64 = n_px → remap degenerates to 0 everywhere
      assert(out(1L).getAs[Long]("checksum") == 0L)
      assert(out(1L).getAs[Long]("stretch_gain") == 0L)
      // two-level: cdf 32/64, cdf_min 32 → bins remap to 0 and 255
      assert(out(2L).getAs[Long]("nv_min") == 0L)
      assert(out(2L).getAs[Long]("nv_max") == 255L)
      assert(out(2L).getAs[Long]("stretch_gain") == 255L - 240L)
    }
  }

  describe("resamplePcm") {
    it("pair-averages with truncation toward zero") {
      // samples 100, 200, −100, −101 (LE int16)
      val payload: Array[Byte] = Array(
        0x64, 0x00, 0xC8.toByte, 0x00,
        0x9C.toByte, 0xFF.toByte, 0x9B.toByte, 0xFF.toByte)
      val media = Seq((7L, payload)).toDF("media_id", "payload")
      val r = Multimodal.resamplePcm(media, frameSamples = 4).collect().head
      assert(r.getAs[Int]("n_out") == 2)
      // outs: (100+200)/2 = 150, (−201)/2 = −100 (toward zero)
      assert(r.getAs[Long]("energy_out") == 150L * 150 + 100L * 100)
      assert(r.getAs[Long]("checksum") == 150L * 1 - 100L * 2)
      assert(r.getAs[Int]("peak_out") == 150)
    }
  }
}
