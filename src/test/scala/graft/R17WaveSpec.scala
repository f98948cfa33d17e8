package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Profiling, TextAnalysis}

/** Golden coverage for the round-17 wave operators: Elo vs market,
  * Brier score/skill, pinball quantile loss, 1-D Wasserstein length
  * drift, Shannon/Simpson diversity. */
class R17WaveSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def dates(n: Int): Seq[java.sql.Date] = (0 until n).map(d =>
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)))

  describe("eloVsMarket") {
    it("a lone symbol only ever draws with its own market: rating pinned at 1500") {
      val rnd = new scala.util.Random(3)
      val panel = dates(40).map(d => ("A", d, (rnd.nextInt(21) - 10).toDouble))
        .toDF("symbol", "trade_date", "daily_return_pct")
      val r = DailyAnalytics.eloVsMarket(panel).collect().head
      assert(r.getAs[Long]("n_days") == 40L)
      assert(r.getAs[Long]("wins") == 0L && r.getAs[Long]("draws") == 40L)
      assert(r.getAs[Double]("elo_rating") == 1500.0, s"$r")
    }

    it("mirror pair: the all-win rating matches the replicated quantized fold") {
      // A = +1%, B = -1% daily -> market mean is exactly 0, A wins every day
      val n = 50
      val panel = dates(n).flatMap(d =>
        Seq(("A", d, 1.0), ("B", d, -1.0)))
        .toDF("symbol", "trade_date", "daily_return_pct")
      def fold(ss: Seq[Long]): Double = {
        var acc = 1500000000L
        ss.foreach { s =>
          acc += math.floor(16.0 * (s / 2.0 -
            1.0 / (1.0 + math.pow(10.0, (1500000000L - acc) / 4.0e8))) * 1.0e6).toLong
        }
        math.floor(acc / 1.0e6 * 100.0 + 0.5) / 100.0
      }
      val got = DailyAnalytics.eloVsMarket(panel).collect()
        .map(r => r.getAs[String]("symbol") ->
          (r.getAs[Long]("wins"), r.getAs[Double]("elo_rating"))).toMap
      assert(got("A") == (n.toLong, fold(Seq.fill(n)(2L))), s"$got")
      assert(got("B") == (0L, fold(Seq.fill(n)(0L))), s"$got")
      assert(got("A")._2 > 1500.0 && got("B")._2 < 1500.0)
    }
  }

  describe("brierSkill") {
    it("alternating signs: trailing rate is exactly 1/2, BSS exactly 0") {
      // o alternates, every trailing-20 count is 10 -> (c-20o)^2 = 100
      val panel = dates(60).zipWithIndex.map { case (d, t) =>
        ("A", d, if (t % 2 == 0) 1.0 else -1.0) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val r = DailyAnalytics.brierSkill(panel).collect().head
      assert(r.getAs[Long]("n_scored") == 40L)
      assert(r.getAs[Double]("base_rate") == 0.5)
      assert(r.getAs[Double]("brier") == 0.25, s"$r")
      assert(r.getAs[Double]("brier_ref") == 0.25, s"$r")
      assert(r.getAs[Double]("bss") == 0.0, s"$r")
    }

    it("an always-up series is forecast perfectly; climatology reference degenerates to NULL") {
      val panel = dates(60).map(d => ("A", d, 2.0))
        .toDF("symbol", "trade_date", "daily_return_pct")
      val r = DailyAnalytics.brierSkill(panel).collect().head
      assert(r.getAs[Double]("brier") == 0.0)
      assert(r.getAs[Double]("brier_ref") == 0.0)
      assert(r.isNullAt(r.fieldIndex("bss")), s"p(1-p)=0 must NULL the skill: $r")
    }
  }

  describe("pinballEval") {
    it("ramp train half + constant test half: losses are the closed-form tau gaps") {
      // train: returns 1..60 (%), so the tau-ladder order statistics are
      // k = (t*59) div 20 + 1 -> forecasts 3, 15, 30, 45, 57; test: 30
      val panel = dates(120).zipWithIndex.map { case (d, t) =>
        ("A", d, if (t < 60) (t + 1).toDouble else 30.0) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val got = DailyAnalytics.pinballEval(panel).orderBy("tau").collect()
        .map(r => (r.getAs[Double]("tau"), r.getAs[Double]("q_forecast_pct"),
          r.getAs[Double]("pinball_pct"))).toSeq
      assert(got == Seq(
        (0.05, 3.0, 1.35),   // 0.05 * (30 - 3)
        (0.25, 15.0, 3.75),  // 0.25 * (30 - 15)
        (0.5, 30.0, 0.0),    // forecast hits the test value exactly
        (0.75, 45.0, 3.75),  // (1 - 0.75) * (45 - 30)
        (0.95, 57.0, 1.35)), // (1 - 0.95) * (57 - 30)
        s"$got")
    }
  }

  describe("wassersteinDrift") {
    it("two-point supports: W1 is the CDF gap times the length gap, both sides") {
      val docs = ((1 to 4).map(i => (i.toLong, "a b", "A")) ++
        (5 to 8).map(i => (i.toLong, "a b c d e", "B")))
        .toDF("doc_id", "text", "source")
      val got = Profiling.wassersteinDrift(docs, "source", "text")
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Double]("w1_tokens"))).toMap
      // each source is half the corpus: |F_s - F_c| = 1/2 on [2, 5)
      assert(got("A") == (4L, 1.5), s"$got")
      assert(got("B") == (4L, 1.5), s"$got")
    }

    it("a single source IS the corpus: W1 = 0") {
      val docs = (1 to 5).map(i => (i.toLong, "x " * i + "x", "only"))
        .toDF("doc_id", "text", "source")
      val r = Profiling.wassersteinDrift(docs, "source", "text").collect().head
      assert(r.getAs[Double]("w1_tokens") == 0.0)
    }
  }

  describe("cdar") {
    it("a flat tape with one 10% shelf: the worst-5% mean IS the shelf depth") {
      // 100 days at 100.00 except ten at 90.00 -> dd = 10% on 10 days;
      // k = (5*99) div 100 + 1 = 5 worst, all exactly 10%
      val panel = dates(100).zipWithIndex.map { case (d, t) =>
        ("A", d, if (t >= 80 && t < 90) 90.0 else 100.0) }
        .toDF("symbol", "trade_date", "close_price")
      val r = DailyAnalytics.cdar(panel).collect().head
      assert(r.getAs[Long]("n_days") == 100L && r.getAs[Long]("k_worst") == 5L)
      assert(r.getAs[Double]("dar_pct") == 10.0, s"$r")
      assert(r.getAs[Double]("cdar_pct") == 10.0, s"$r")
    }

    it("a monotone ramp never draws down: DaR = CDaR = 0") {
      val panel = dates(80).zipWithIndex.map { case (d, t) =>
        ("A", d, 100.0 + t) }
        .toDF("symbol", "trade_date", "close_price")
      val r = DailyAnalytics.cdar(panel).collect().head
      assert(r.getAs[Double]("dar_pct") == 0.0 && r.getAs[Double]("cdar_pct") == 0.0)
    }
  }

  describe("energyDistanceSplit") {
    it("a second half repeating the first is distance zero") {
      val rnd = new scala.util.Random(13)
      val half = (0 until 30).map(_ => (rnd.nextInt(41) - 20).toDouble)
      val panel = dates(60).zipWithIndex.map { case (d, t) =>
        ("A", d, half(t % 30)) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val r = DailyAnalytics.energyDistanceSplit(panel).collect().head
      assert(r.getAs[Long]("n1") == 30L && r.getAs[Long]("n2") == 30L)
      assert(r.getAs[Double]("e_dist_pct") == 0.0, s"$r")
      assert(r.getAs[Double]("t_energy") == 0.0, s"$r")
    }

    it("two constants: E = 2|a - b| and T = (n1 n2 / n) E, exactly") {
      val panel = dates(60).zipWithIndex.map { case (d, t) =>
        ("A", d, if (t < 30) 1.0 else 3.0) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val r = DailyAnalytics.energyDistanceSplit(panel).collect().head
      assert(r.getAs[Double]("e_dist_pct") == 4.0, s"$r")   // 2 * |1 - 3|
      assert(r.getAs[Double]("t_energy") == 60.0, s"$r")    // (30*30/60) * 4
    }
  }

  describe("mattr") {
    it("all-distinct, all-same, and short-doc TTR fallback hit the closed forms") {
      val distinct30 = (1 to 30).map(i => s"w$i").mkString(" ")
      val docs = Seq(
        (1L, distinct30, "x"),        // every window 25 distinct -> 1.0
        (2L, Seq.fill(30)("a").mkString(" "), "y"), // 1/25
        (3L, "a b a", "z"))           // short: plain TTR 2/3
        .toDF("doc_id", "text", "source")
      val got = TextAnalysis.mattr(docs, "source", "text").collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_short"), r.getAs[Double]("mattr"))).toMap
      assert(got("x") == (0L, 1.0), s"$got")
      assert(got("y") == (0L, 0.04), s"$got")
      assert(got("z") == (1L, 0.666667), s"$got")
    }
  }

  describe("tailDependence") {
    it("a market-driving pair has lambda 1, a flat symbol lambda 0") {
      // A and B carry a distinct permutation, C is flat: the index is
      // floor(2a/3), strictly monotone in a — so the market's tail
      // days ARE A's (and B's) tail days, and never C's
      val rnd = new scala.util.Random(19)
      val perm = rnd.shuffle((1 to 100).toList)
      val panel = dates(100).zipWithIndex.flatMap { case (d, t) =>
        Seq(("A", d, perm(t).toDouble), ("B", d, perm(t).toDouble),
          ("C", d, 0.0)) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val got = DailyAnalytics.tailDependence(panel).collect()
        .map(r => r.getAs[String]("symbol") ->
          (r.getAs[Long]("n_mkt_up"), r.getAs[Double]("lambda_upper"),
            r.getAs[Long]("n_mkt_down"), r.getAs[Double]("lambda_lower"))).toMap
      // ux = 95th smallest of 100 distinct -> 5 exceedances; lx = 5th -> 4
      assert(got("A") == (5L, 1.0, 4L, 1.0), s"$got")
      assert(got("B") == (5L, 1.0, 4L, 1.0), s"$got")
      assert(got("C") == (5L, 0.0, 4L, 0.0), s"$got")
    }

    it("a constant market has empty tails: counts 0, lambdas NULL") {
      // A = -B makes every day's index floor(0/2) = 0
      val panel = dates(80).zipWithIndex.flatMap { case (d, t) =>
        Seq(("A", d, (t % 7 + 1).toDouble), ("B", d, -(t % 7 + 1).toDouble)) }
        .toDF("symbol", "trade_date", "daily_return_pct")
      val rows = DailyAnalytics.tailDependence(panel).collect()
      rows.foreach { r =>
        assert(r.getAs[Long]("n_mkt_up") == 0L && r.getAs[Long]("n_mkt_down") == 0L)
        assert(r.isNullAt(r.fieldIndex("lambda_upper")))
        assert(r.isNullAt(r.fieldIndex("lambda_lower")))
      }
    }
  }

  describe("keynessLlr") {
    it("a balanced token scores 0; a one-sided token scores 2 ln 2 with the right direction") {
      val docs = Seq((0L, "aa bb"), (1L, "aa cc")).toDF("doc_id", "text")
      val got = TextAnalysis.keynessLlr(docs, "doc_id", "text")
        .collect().map(r => r.getAs[String]("token") ->
          (r.getAs[Double]("g2_llr"), r.getAs[String]("overused_in"))).toMap
      assert(got("aa")._1 == 0.0, s"$got")
      assert(got("bb") == (1.3863, "even_ids"), s"$got") // 2 ln 2
      assert(got("cc") == (1.3863, "odd_ids"), s"$got")
    }
  }

  describe("tokenBurstiness") {
    it("a clumped token has VMR (N s2 - s^2)/(N s); an evenly spread one has 0") {
      val docs = Seq((1L, "z z z z u"), (2L, "u"), (3L, "u"), (4L, "u"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.tokenBurstiness(docs, "doc_id", "text")
        .collect().map(r => r.getAs[String]("token") ->
          (r.getAs[Long]("n_occ"), r.getAs[Long]("n_docs_with"),
            r.getAs[Double]("vmr_burstiness"))).toMap
      // z: N=4, sum=4, sumsq=16 -> (64-16)/16 = 3; u: (4*4-16)/16 = 0
      assert(got("z") == (4L, 1L, 3.0), s"$got")
      assert(got("u") == (4L, 4L, 0.0), s"$got")
    }
  }

  describe("diversityIndex") {
    it("uniform vocabulary: Shannon = ln V, Simpson = 0, evenness = 1") {
      val docs = Seq((1L, "a b", "u"), (2L, "c d", "u"))
        .toDF("doc_id", "text", "source")
      val r = TextAnalysis.diversityIndex(docs, "source", "text").collect().head
      assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("vocab") == 4L)
      assert(r.getAs[Double]("shannon_nats") == 1.386294, s"$r") // ln 4
      assert(r.getAs[Double]("simpson_concentration") == 0.0)
      assert(r.getAs[Double]("pielou_evenness") == 1.0, s"$r")
    }

    it("a one-token source: zero entropy, Simpson 1, evenness NULL (ln 1 = 0)") {
      val docs = Seq((1L, "m m m m", "mono")).toDF("doc_id", "text", "source")
      val r = TextAnalysis.diversityIndex(docs, "source", "text").collect().head
      assert(r.getAs[Double]("shannon_nats") == 0.0)
      assert(r.getAs[Double]("simpson_concentration") == 1.0)
      assert(r.isNullAt(r.fieldIndex("pielou_evenness")), s"$r")
    }
  }
}
