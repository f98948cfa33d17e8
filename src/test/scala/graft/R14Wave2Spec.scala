package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Graph, Multimodal, Profiling, TextAnalysis}

/** Golden/invariant coverage for the round-14 wave-2 operators: Otsu
  * threshold, 3×3 morphology, audio ZCR, Kyle's lambda, Holt–Winters,
  * sampled closeness, TextRank, and Cramér's V — each pinned on a
  * constructed input whose answer is exact by hand. */
class R14Wave2Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def raster(v: (Long, Long) => Long) = {
    val px = for { y <- 0L until 8L; x <- 0L until 8L } yield (1L, y, x, v(y, x))
    px.toDF("media_id", "y", "x", "v")
  }

  describe("otsuThreshold") {
    it("splits a perfect two-level raster at the lower level's bin") {
      // 32 px at 0, 32 at 255: ω0 = ω1 = ½, μ0 = 0, μ1 = 255 →
      // σ²_B = ¼·255² = 16256.25, split after bin 0
      val out = Multimodal.otsuThreshold(raster((y, _) => if (y < 4) 0L else 255L))
        .collect().head
      assert(out.getAs[Long]("thr_bin") == 0L)
      assert(out.getAs[Long]("n_bg") == 32L)
      assert(out.getAs[Long]("n_fg") == 32L)
      assert(out.getAs[Double]("between_var") == 16256.25)
    }
    it("assigns the middle level to the nearer class on a 0/128/255 raster") {
      // 24/16/24 px at 0/128/255: candidate cuts are t=0 (0 vs rest,
      // σ²_B = 196032²/(24·40·4096) ≈ 9773) and t=8 (0+128 vs 255,
      // ≈ 9735) — the t=0 cut wins because 128 sits (just) closer to
      // the upper class mean
      val out = Multimodal.otsuThreshold(raster((y, x) =>
        if (y < 3) 0L else if (y < 5) 128L else 255L)).collect().head
      assert(out.getAs[Long]("thr_bin") == 0L)
      assert(out.getAs[Long]("n_bg") == 24L)
      val v = out.getAs[Double]("between_var")
      assert(v > 9772.0 && v < 9774.0)
    }
  }

  describe("morphology3x3") {
    it("keeps a solid raster unchanged (erode = dilate = interior)") {
      val out = Multimodal.morphology3x3(raster((_, _) => 255L)).collect().head
      assert(out.getAs[Long]("n_interior") == 36L)
      assert(out.getAs[Long]("n_fg") == 36L)
      assert(out.getAs[Long]("n_erode") == 36L)
      assert(out.getAs[Long]("n_dilate") == 36L)
      assert(out.getAs[Long]("gradient_px") == 0L)
      // Σ (y·8 + x + 1) over the 6×6 interior = 36 + 8·21·6 + 21·6
      assert(out.getAs[Long]("erode_checksum") == 1170L)
      assert(out.getAs[Long]("dilate_checksum") == 1170L)
    }
    it("erodes an isolated pixel away and dilates it to its 3x3 ball") {
      val out = Multimodal.morphology3x3(raster((y, x) =>
        if (y == 3 && x == 3) 255L else 0L)).collect().head
      assert(out.getAs[Long]("n_fg") == 1L)
      assert(out.getAs[Long]("n_erode") == 0L)
      assert(out.getAs[Long]("n_dilate") == 9L)
      assert(out.getAs[Long]("gradient_px") == 9L)
      // Σ (8y + x + 1) for x, y ∈ {2,3,4} = 9 + 8·9·3 + 9·3
      assert(out.getAs[Long]("dilate_checksum") == 252L)
    }
  }

  describe("zcrFrames") {
    it("counts every flip of an alternating-sign square wave") {
      // +100/−100 LE int16: 16 samples per frame, 15 flips, Σ|v| = 1600
      val bytes = (0 until 16).flatMap { i =>
        if (i % 2 == 0) Seq(0x64.toByte, 0x00.toByte)
        else Seq(0x9c.toByte, 0xff.toByte)
      }.toArray
      val out = Multimodal.zcrFrames(Seq((1L, bytes)).toDF("media_id", "payload"))
        .collect().head
      assert(out.getAs[Int]("n_samples") == 16)
      assert(out.getAs[Int]("crossings") == 15)
      assert(out.getAs[Long]("sum_abs") == 1600L)
    }
    it("treats zero as the non-negative class (no flip on 0 → +)") {
      // 0, +5, −5, 0: flips at +5→−5 and −5→0 only
      val samples = Seq(0, 5, -5, 0)
      val bytes = samples.flatMap(v =>
        Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
      val out = Multimodal.zcrFrames(Seq((1L, bytes)).toDF("media_id", "payload"),
        frameSamples = 4).collect().head
      assert(out.getAs[Int]("crossings") == 2)
      assert(out.getAs[Long]("sum_abs") == 10L)
    }
    it("drops a trailing partial frame (full-frame contract)") {
      // 7 samples at frameSamples=4 → exactly one 4-sample frame
      val bytes = (0 until 7).flatMap(_ => Seq(0x01.toByte, 0x00.toByte)).toArray
      val out = Multimodal.zcrFrames(Seq((1L, bytes)).toDF("media_id", "payload"),
        frameSamples = 4).collect()
      assert(out.length == 1)
      assert(out.head.getAs[Int]("n_samples") == 4)
      assert(out.head.getAs[Long]("sum_abs") == 4L)
    }
  }

  describe("kyleLambda") {
    it("recovers slope 1 and correlation 1 when return equals flow exactly") {
      // close 100.00 → x = ±10000; return ±1.0000 → y = ±10000 = x
      val rows = (0 until 32).map(d =>
        ("A", if (d % 2 == 0) 1.0 else -1.0, 1L, 100.0))
      val out = DailyAnalytics.kyleLambda(
        rows.toDF("symbol", "daily_return_pct", "volume", "close_price"))
        .collect().head
      assert(out.getAs[Long]("n_days") == 32L)
      assert(out.getAs[Double]("lambda_per_musd") == 10000.0)
      assert(out.getAs[Double]("flow_corr") == 1.0)
    }
  }

  describe("holtWinters") {
    def barsDf(rows: Seq[(String, Int, Double)]) =
      rows.toDF("symbol", "day", "close_price")
        .withColumn("trade_date", date_add(to_date(lit("2024-01-01")), col("day")))
        .drop("day")
    it("is an exact fixed point on a constant series") {
      val rows = (0 until 45).map(d => ("A", d, 50.0))
      val out = DailyAnalytics.holtWinters(barsDf(rows)).collect().head
      assert(out.getAs[Long]("n_days") == 45L)
      assert(out.getAs[Double]("level") == 50.0)
      assert(out.getAs[Double]("trend_per_day") == 0.0)
      assert(out.getAs[Double]("seasonal_amplitude") == 0.0)
      assert(out.getAs[Double]("forecast_1d") == 50.0)
      assert(out.getAs[Double]("one_step_mae") == 0.0)
    }
    it("matches a reference fold on a seasonal-plus-trend series") {
      val closes = (0 until 50).map(d => 100.0 + d * 0.25 +
        Array(0.0, 2.0, -1.0, 3.0, -4.0)(d % 5))
      val ys = closes.map(c => math.floor(c * 100.0 + 0.5).toLong)
      def div(a: Long, b: Long) = a / b // truncating, mirrors `div`
      val l0 = div(ys.take(5).sum, 5L)
      var (l, b) = (l0, 0L)
      var s = ys.take(5).map(_ - l0).toVector
      var sae = 0L
      ys.drop(5).foreach { y =>
        val sOld = s.head
        val err = math.abs(y - (l + b + sOld))
        val lN = div(30 * (y - sOld) + 70 * (l + b), 100L)
        val bN = div(10 * (lN - l) + 90 * b, 100L)
        val sN = div(20 * (y - lN) + 80 * sOld, 100L)
        s = s.tail :+ sN; l = lN; b = bN; sae += err
      }
      val rows = closes.zipWithIndex.map { case (c, d) => ("A", d, c) }
      val out = DailyAnalytics.holtWinters(barsDf(rows)).collect().head
      assert(out.getAs[Double]("level") ==
        math.floor(l / 100.0 * 100.0 + 0.5) / 100.0)
      assert(out.getAs[Double]("forecast_1d") ==
        math.floor((l + b + s.head) / 100.0 * 100.0 + 0.5) / 100.0)
      assert(out.getAs[Double]("one_step_mae") ==
        math.floor(sae / 100.0 / 45.0 * 10000.0 + 0.5) / 10000.0)
    }
  }

  describe("closenessSample") {
    it("computes exact hop sums on a 6-path within 4 hops") {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
        .toDF("u", "v")
      val out = Graph.closenessSample(edges, "u", "v")
        .collect().map(r => r.getAs[Long]("seed") -> r).toMap
      // seed 1 reaches 2,3,4,5 (hops 1+2+3+4 = 10); 6 is 5 hops away
      assert(out(1L).getAs[Long]("n_reached") == 4L)
      assert(out(1L).getAs[Long]("sum_hops") == 10L)
      assert(out(1L).getAs[Double]("closeness") == 0.4)
      // harmonic: 1 + ½ + ⅓ + ¼ via truncated scale-12 longs
      assert(out(1L).getAs[Double]("harmonic") == 2.083333)
      // seed 3 reaches all 5 others: hops 2,1,1,2,3
      assert(out(3L).getAs[Long]("n_reached") == 5L)
      assert(out(3L).getAs[Long]("sum_hops") == 9L)
      assert(out(3L).getAs[Double]("closeness") == 0.555556)
    }
  }

  describe("textRank") {
    it("holds the uniform fixed point on a regular co-occurrence graph") {
      // 7 tokens → pairs ab, bc, ac each twice; every word has
      // wdeg 4, and s = 1e9 is exactly stationary: in_sum =
      // 2·((1e9 div 4)·2) = 1e9 → 0.15e9 + (17·1e9) div 20 = 1e9
      val docs = Seq(("aaaa bbbb cccc aaaa bbbb cccc aaaa"))
        .toDF("text")
      val out = TextAnalysis.textRank(docs, "text").collect()
      assert(out.length == 3)
      assert(out.map(_.getAs[String]("word")).toSeq ==
        Seq("aaaa", "bbbb", "cccc")) // equal scores → word asc
      assert(out.forall(_.getAs[Long]("score") == 1000000000L))
      assert(out.forall(_.getAs[Long]("wdeg") == 4L))
      assert(out.forall(_.getAs[Long]("n_neighbors") == 2L))
    }
    it("drops short tokens and sub-threshold pairs") {
      val docs = Seq(("aaaa of bbbb aaaa of bbbb xxxx yyyy"))
        .toDF("text")
      // "of" is filtered (len < 4); adjacency is over the filtered
      // sequence → (aaaa,bbbb) ×2 survives; (xxxx,yyyy) ×1 does not
      val out = TextAnalysis.textRank(docs, "text").collect()
      assert(out.map(_.getAs[String]("word")).toSet == Set("aaaa", "bbbb"))
    }
  }

  describe("cramersV") {
    it("is 1 on perfect association and 0 on exact independence") {
      val perfect = (0 until 10).flatMap(_ =>
        Seq(("g1", "a1", "b1"), ("g1", "a2", "b2")))
      val indep = for {
        a <- Seq("a1", "a2"); b <- Seq("b1", "b2")
      } yield ("g2", a, b)
      val df = (perfect ++ indep).toDF("grp", "seg", "prio")
      val out = Profiling.cramersV(df, "grp", "seg", "prio")
        .collect().map(r => r.getAs[String]("grp") -> r).toMap
      assert(out("g1").getAs[Double]("cramers_v") == 1.0)
      assert(out("g1").getAs[Double]("chi2") == 20.0)
      assert(out("g2").getAs[Double]("cramers_v") == 0.0)
      assert(out("g2").getAs[Double]("chi2") == 0.0)
      assert(out("g1").getAs[Long]("n_levels_a") == 2L)
    }
  }
}
