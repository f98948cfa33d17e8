package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Dedup, TextAnalysis, TickAnalytics}

/** Golden coverage for the round-16 wave operators: paragraph-grain
  * dedup, Good-Turing/Chao1 vocabulary estimates, realized-kernel
  * variance, Hill tail index. */
class R16WaveSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("paragraphDedup") {
    it("marks paragraphs duplicated corpus-wide, including within-doc repeats") {
      val docs = Seq(
        (1L, "aaa\nbbb"),   // bbb shared with doc 2
        (2L, "bbb\nccc"),
        (3L, "ddd\nddd"),   // within-doc repeat counts as duplication
        (4L, "eee"))        // all-unique doc
        .toDF("doc_id", "text")
      val got = Dedup.paragraphDedup(docs, "doc_id", "text")
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(got == Seq(
        (1L, 2L, 1L, 6L, 0.5),
        (2L, 2L, 1L, 6L, 0.5),
        (3L, 2L, 2L, 6L, 1.0),
        (4L, 1L, 0L, 3L, 0.0)))
    }

    it("drops empty paragraphs (separator runs) without shifting counts") {
      val docs = Seq((1L, "\naaa\n\nbbb\n")).toDF("doc_id", "text")
      val got = Dedup.paragraphDedup(docs, "doc_id", "text").collect().head
      assert(got.getAs[Long]("n_paras") == 2L)
      assert(got.getAs[Long]("n_chars") == 6L)
    }
  }

  describe("goodTuring") {
    it("recovers the closed-form estimates on a tiny known distribution") {
      // tokens: a x3, b x2, c x1, d x1 -> N=7 V=4 N1=2 N2=1
      val docs = Seq((1L, "a a a b"), (2L, "b c d")).toDF("doc_id", "text")
      val r = TextAnalysis.goodTuring(docs, "doc_id", "text").collect().head
      assert(r.getAs[Long]("n_tokens") == 7L)
      assert(r.getAs[Long]("vocab") == 4L)
      assert(r.getAs[Long]("n1_singletons") == 2L)
      assert(r.getAs[Long]("n2_doubletons") == 1L)
      assert(r.getAs[Double]("p0_unseen") == 0.285714, s"$r")
      assert(r.getAs[Double]("gt_singleton_count") == 1.0, s"$r")
      // Chao1 = 4 + 2*1/(2*2) = 4.5
      assert(r.getAs[Double]("chao1_vocab") == 4.5, s"$r")
    }

    it("a duplicate-free corpus has p0 = 1 and Chao1 explodes quadratically") {
      val docs = Seq((1L, "t1 t2 t3 t4")).toDF("doc_id", "text")
      val r = TextAnalysis.goodTuring(docs, "doc_id", "text").collect().head
      assert(r.getAs[Double]("p0_unseen") == 1.0)
      // V + N1(N1-1)/(2(N2+1)) = 4 + 4*3/2 = 10
      assert(r.getAs[Double]("chao1_vocab") == 10.0)
    }
  }

  describe("realizedKernel") {
    def ticks(prices: Seq[Double], symbol: String = "A") =
      prices.zipWithIndex.map { case (p, i) =>
        (symbol, java.sql.Timestamp.valueOf(f"2024-01-02 09:${i / 60}%02d:${i % 60}%02d"), p)
      }.toDF("symbol", "event_time", "price")

    it("a constant tape has zero variance under both estimators") {
      val r = TickAnalytics.realizedKernel(ticks(Seq.fill(40)(25.0)),
        minMoves = 5).collect().head
      assert(r.getAs[Double]("rv_var") == 0.0)
      assert(r.getAs[Double]("rk_var") == 0.0)
      assert(r.getAs[Double]("rk_vol") == 0.0)
    }

    it("pure bid-ask bounce: the kernel nets out most of the spread-squared bias") {
      // alternating 10.00 / 10.01: dp = +1, -1, +1, ... (scale 2)
      val prices = (0 until 21).map(i => if (i % 2 == 0) 10.00 else 10.01)
      val r = TickAnalytics.realizedKernel(ticks(prices), minMoves = 5)
        .collect().head
      val m = 20 // moves
      val wts = TickAnalytics.parzenWeights(5)
      val gammas = (1 to 5).map(j =>
        (if (j % 2 == 1) -1.0 else 1.0) * (m - j))
      val rkExp = (m.toDouble + 2.0 * (1 to 5).map(j =>
        wts(j - 1) * gammas(j - 1)).sum) / 1e4
      assert(r.getAs[Long]("n_moves") == m.toLong)
      assert(r.getAs[Double]("rv_var") == 0.002) // m / 1e4
      val rk = r.getAs[Double]("rk_var")
      assert(math.abs(rk - rkExp) <= 1e-6, s"rk=$rk exp=$rkExp")
      assert(rk < r.getAs[Double]("rv_var") / 10,
        "kernel must remove most of the bounce bias")
    }

    it("days under minMoves are dropped") {
      val r = TickAnalytics.realizedKernel(ticks(Seq(1.0, 2.0, 3.0)),
        minMoves = 5).collect()
      assert(r.isEmpty)
    }
  }

  describe("hillTail") {
    it("exact power-law order statistics recover xi = 10.5 ln 2") {
      // top-21 losses are 2^21..2^1 (scale-4 exact); 20 filler at 2^0
      // reach minLosses. ln(x_i / x_(21)) = (21-i) ln2 for i = 1..20
      // -> xi = ln2 * (sum 1..20)/20 = 10.5 ln2
      val rows = (1 to 21).map(m =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(m)), -math.pow(2.0, m) / 1e4)) ++
        (1 to 20).map(j =>
          ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 2, 1)
            .plusDays(j)), -1.0 / 1e4))
      val r = DailyAnalytics.hillTail(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(r.getAs[Long]("n_losses") == 41L)
      assert(r.getAs[Long]("k_top") == 20L)
      val exp = 10.5 * math.log(2.0)
      assert(math.abs(r.getAs[Double]("xi_hill") - exp) <= 1e-6, s"$r")
      assert(math.abs(r.getAs[Double]("alpha_tail") - 1.0 / exp) <= 1e-6, s"$r")
    }

    it("degenerate flat tail: all top losses equal -> xi 0, alpha NULL") {
      val rows = (1 to 45).map(j =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(j)), -0.5))
      val r = DailyAnalytics.hillTail(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(r.getAs[Double]("xi_hill") == 0.0)
      assert(r.isNullAt(r.fieldIndex("alpha_tail")))
    }

    it("symbols without enough losses are excluded") {
      val rows = (1 to 30).map(j =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(j)), -0.5))
      assert(DailyAnalytics.hillTail(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().isEmpty)
    }
  }
}
