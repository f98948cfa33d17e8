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

  describe("brownForsythe") {
    // Mondays / Tuesdays of Jan 2024 (2024-01-01 is a Monday)
    def mon(i: Int) = java.sql.Date.valueOf(f"2024-01-${1 + 7 * i}%02d")
    def tue(i: Int) = java.sql.Date.valueOf(f"2024-01-${2 + 7 * i}%02d")

    it("recovers the exact closed-form decomposition on a 2-group panel") {
      // Mon returns {1,2,4}%: z = {20000, 0, 40000} (2x scale-4 units)
      // Tue returns {1,2,3}%: z = {20000, 0, 20000}
      val rows = Seq(mon(0) -> 1.0, mon(1) -> 2.0, mon(2) -> 4.0,
        tue(0) -> 1.0, tue(1) -> 2.0, tue(2) -> 3.0)
        .map { case (d, r) => ("A", d, r) }
      val out = DailyAnalytics.brownForsythe(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(out.getAs[Long]("n_days") == 6L)
      assert(out.getAs[Long]("k_groups") == 2L)
      assert(out.getAs[Double]("ss_between") == 0.1667, s"$out")
      assert(out.getAs[Double]("ss_within") == 2.6667, s"$out")
      assert(out.getAs[Double]("f_stat") == 0.25, s"$out")
      assert(out.getAs[Double]("eta_sq") == 0.058824, s"$out")
    }

    it("zero within-group deviation NULLs the F (anovaDow convention)") {
      val rows = Seq(mon(0), mon(1), tue(0), tue(1))
        .map(d => ("A", d, 0.5))
      val out = DailyAnalytics.brownForsythe(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(out.isNullAt(out.fieldIndex("f_stat")), s"$out")
    }
  }

  describe("pettittTest") {
    it("a clean level shift puts the change point at the boundary with the exact K") {
      // 30 days at -1% then 30 at +1%: doubled tie ranks 31 / 91,
      // U_t = -30t up to the break -> K = 900 at t = 30
      val rows = (0 until 60).map(j =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(j)), if (j < 30) -1.0 else 1.0))
      val r = DailyAnalytics.pettittTest(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(r.getAs[Long]("n_days") == 60L)
      assert(r.getAs[Long]("k_stat") == 900L)
      assert(r.getAs[java.sql.Date]("change_date") ==
        java.sql.Date.valueOf("2024-01-30"))
      assert(r.getAs[Double]("p_approx") == 0.0) // 2e^-22 floors to 0
      assert(r.getAs[Boolean]("significant"))
    }

    it("a constant series carries zero K and is never significant") {
      val rows = (0 until 80).map(j =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(j)), 0.7))
      val r = DailyAnalytics.pettittTest(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      // all ties: R_i = n+1 for every row -> U_t = 0 everywhere
      assert(r.getAs[Long]("k_stat") == 0L)
      assert(r.getAs[Double]("p_approx") == 1.0)
      assert(!r.getAs[Boolean]("significant"))
    }
  }

  describe("tokenDispersion") {
    it("computes Juilland's D with zeros counted through m") {
      val docs = Seq((1L, "a a b", "s1"), (2L, "a c", "s2"))
        .toDF("doc_id", "text", "source")
      val got = TextAnalysis.tokenDispersion(docs, "doc_id", "text", "source")
        .as[(String, Long, Long, Double)].collect().toSeq
      // a: f = {2, 1} over m = 2 -> CV = (1/2)/(3/2) -> D = 2/3
      // b, c: f = {1, 0} -> CV = 1 -> D = 0; order (ft DESC, token)
      assert(got == Seq(
        ("a", 3L, 2L, 0.666667),
        ("b", 1L, 1L, 0.0),
        ("c", 1L, 1L, 0.0)))
    }

    it("a perfectly even token scores D = 1") {
      val docs = Seq((1L, "x x", "s1"), (2L, "x x", "s2"), (3L, "x x", "s3"))
        .toDF("doc_id", "text", "source")
      val got = TextAnalysis.tokenDispersion(docs, "doc_id", "text", "source")
        .collect().head
      assert(got.getAs[Double]("juilland_d") == 1.0)
    }
  }

  describe("kupiecPof") {
    def panel(test: Seq[Double], symbol: String = "A") = {
      // train: 3 marker losses then 47 flat -> VaR = 3rd smallest = -1%
      val train = Seq(-3.0, -2.0, -1.0) ++ Seq.fill(47)(0.5)
      (train ++ test).zipWithIndex.map { case (r, i) =>
        (symbol, java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1)
          .plusDays(i)), r)
      }
    }

    it("counts strict violations of the train-half VaR and matches the LR closed form") {
      // test half: 5 violations, one AT the threshold (not a violation)
      val test = Seq.fill(5)(-2.0) ++ Seq(-1.0) ++ Seq.fill(44)(0.0)
      val r = DailyAnalytics.kupiecPof(
        panel(test).toDF("symbol", "trade_date", "daily_return_pct"))
        .collect().head
      assert(r.getAs[Long]("n_test") == 50L)
      assert(r.getAs[Long]("n_violations") == 5L)
      assert(r.getAs[Double]("var_pct") == -1.0)
      assert(r.getAs[Double]("violation_rate") == 0.1)
      val exp = -2.0 * (45.0 * math.log(0.95) + 5.0 * math.log(0.05) -
        45.0 * math.log(45.0 / 50.0) - 5.0 * math.log(5.0 / 50.0))
      assert(math.abs(r.getAs[Double]("lr_pof") -
        math.floor(exp * 1e4 + 0.5) / 1e4) <= 1e-9, s"$r")
      assert(!r.getAs[Boolean]("reject_model")) // LR ~2.07 < 3.8415
    }

    it("gross violation-rate mismatch rejects; zero violations takes the 0*ln0 limit") {
      val hot = Seq.fill(20)(-5.0) ++ Seq.fill(30)(0.0)
      val cold = Seq.fill(50)(0.0)
      val rows = panel(hot, "H") ++ panel(cold, "C")
      val got = DailyAnalytics.kupiecPof(
        rows.toDF("symbol", "trade_date", "daily_return_pct"))
        .collect().map(r => r.getAs[String]("symbol") -> r).toMap
      assert(got("H").getAs[Boolean]("reject_model"), s"${got("H")}")
      assert(got("C").getAs[Long]("n_violations") == 0L)
      val expC = -2.0 * (50.0 * math.log(0.95) + 0.0 * math.log(0.05) -
        50.0 * math.log(50.0 / 50.0) - 0.0)
      assert(math.abs(got("C").getAs[Double]("lr_pof") -
        math.floor(expC * 1e4 + 0.5) / 1e4) <= 1e-9, s"${got("C")}")
    }
  }

  describe("rboDrift") {
    it("identical half rankings score RBO 1 at depth <= list length") {
      val docs = Seq((0L, "a a a b b c"), (1L, "a a a b b c"),
        (2L, "a a a b b c"), (3L, "a a a b b c")).toDF("doc_id", "text")
      val r = TextAnalysis.rboDrift(docs, "doc_id", "text", depth = 3)
        .collect().head
      assert(r.getAs[Long]("n_common") == 3L)
      assert(r.getAs[Double]("rbo") == 1.0, s"$r")
      // the truncated contract: the SAME identical lists scored
      // against a deeper ideal are penalized for exhausting early
      val deep = TextAnalysis.rboDrift(docs, "doc_id", "text", depth = 50)
        .collect().head
      assert(deep.getAs[Double]("rbo") < 1.0)
    }

    it("a rank swap at the top costs exactly the missing depth-1 term") {
      // half A ranks (a, b); half B ranks (b, a): prefixes agree from
      // depth 2 on -> RBO = 2*S(2)/norm
      val docs = Seq((0L, "a a b"), (1L, "b b a")).toDF("doc_id", "text")
      val r = TextAnalysis.rboDrift(docs, "doc_id", "text").collect().head
      val s = TextAnalysis.rboPartialSums(50, 0.9)
      val norm = (1 to 50).map(i => math.pow(0.9, i - 1)).sum
      val exp = (math.floor(s(1) * 1e12 + 0.5) * 2) / 1e12 / norm
      assert(r.getAs[Long]("n_common") == 2L)
      assert(math.abs(r.getAs[Double]("rbo") -
        math.floor(exp * 1e6 + 0.5) / 1e6) <= 1e-9, s"$r")
    }
  }

  describe("bradleyTerry") {
    import graft.operators.Cohorts

    it("recovers the closed-form 3:1 strength split for two items") {
      // A beats B 3 of 4: MLE strengths 0.75 / 0.25, and the MM
      // reaches the fixpoint in one round (4/(wA+wB) stays 2)
      val games = Seq(("A", "B", 4L, 3L), ("B", "A", 4L, 1L))
        .toDF("i", "j", "n", "wi")
      val got = Cohorts.bradleyTerry(games).collect()
        .map(r => r.getAs[String]("symbol") -> r).toMap
      assert(got("A").getAs[Double]("bt_strength") == 0.75, s"${got("A")}")
      assert(got("B").getAs[Double]("bt_strength") == 0.25)
      assert(got("A").getAs[Long]("wins") == 3L)
      assert(got("A").getAs[Long]("games") == 4L)
    }

    it("a rock-paper-scissors cycle is perfectly symmetric: all strengths equal") {
      val p = Seq(("A", "B", 3L, 2L), ("B", "C", 3L, 2L), ("C", "A", 3L, 2L))
      val games = (p ++ p.map { case (i, j, n, w) => (j, i, n, n - w) })
        .toDF("i", "j", "n", "wi")
      val got = Cohorts.bradleyTerry(games).collect()
      assert(got.length == 3)
      got.foreach(r =>
        assert(r.getAs[Double]("bt_strength") == 0.333333, s"$r"))
    }
  }

  describe("passAtK") {
    import graft.operators.Cohorts

    it("matches the closed forms: c=1/n=10 gives exactly 0.5 at k=5") {
      val ev = ((1 to 10).map(i => ("t1", i == 1)) ++   // 1 of 10
        (1 to 5).map(_ => ("t2", true)) ++              // all pass
        (1 to 10).map(_ => ("t3", false)) ++            // none pass
        (1 to 4).map(_ => ("t4", true)))                // n < k: dropped
        .toDF("task_id", "ok")
      val got = Cohorts.passAtK(ev, "task_id", col("ok"), k = 5)
        .collect().map(r => r.getAs[String]("task") -> r).toMap
      assert(!got.contains("t4"))
      // 1 - (9/10)(8/9)(7/8)(6/7)(5/6) = 1 - 5/10
      assert(got("t1").getAs[Double]("pass_at_5") == 0.5, s"${got("t1")}")
      assert(got("t1").getAs[Double]("pass_at_1") == 0.1)
      assert(got("t2").getAs[Double]("pass_at_5") == 1.0) // n-c < k branch
      assert(got("t3").getAs[Double]("pass_at_5") == 0.0)
    }
  }
}
