package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Cohorts, DailyAnalytics, TextAnalysis, TickAnalytics}

/** Golden/invariant coverage for the round-14 wave-3 operators: VPIN
  * flow toxicity, Markov entropy rate, Dirichlet query likelihood,
  * and daily HHI concentration. */
class R14Wave3Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def ticksDf(rows: Seq[(String, Long, Double)]) =
    rows.toDF("symbol", "event_id", "price")
      .withColumn("ts", expr("timestamp_seconds(event_id)"))

  describe("vpin") {
    it("scores 1 on one-way flow (monotone up then monotone down)") {
      val up = (1 to 50).map(i => ("A", i.toLong, 100.0 + i))
      val dn = (51 to 100).map(i => ("A", i.toLong, 150.0 - (i - 50)))
      val out = TickAnalytics.vpin(ticksDf(up ++ dn)).collect().head
      assert(out.getAs[Long]("n_buckets") == 2L)
      assert(out.getAs[Long]("sum_imbalance") == 100L)
      assert(out.getAs[Long]("max_imbalance") == 50L)
      assert(out.getAs[Double]("vpin") == 1.0)
    }
    it("nets out to 2/50 on a strict up/down alternation") {
      // tick 1 defaults buy; then 25 upticks / 24 downticks in the
      // 50-trade bucket → |26 − 24| = 2
      val rows = (1 to 50).map(i => ("A", i.toLong,
        if (i % 2 == 0) 11.0 else 10.0))
      val out = TickAnalytics.vpin(ticksDf(rows)).collect().head
      assert(out.getAs[Long]("n_buckets") == 1L)
      assert(out.getAs[Long]("sum_imbalance") == 2L)
      assert(out.getAs[Double]("vpin") == 0.04)
    }
    it("drops partial buckets") {
      val rows = (1 to 74).map(i => ("A", i.toLong, 100.0 + i))
      val out = TickAnalytics.vpin(ticksDf(rows)).collect().head
      assert(out.getAs[Long]("n_buckets") == 1L) // 74 ticks → one full 50
    }
  }

  describe("entropyRate") {
    def eventsDf(rows: Seq[(Long, Long, String)]) =
      rows.toDF("user_id", "event_id", "event_type")
        .withColumn("event_time", expr("timestamp_seconds(event_id)"))
    it("gives exactly 1 bit to a uniform binary branch and 0 to a deterministic one") {
      // a b a c ×10 + trailing a: a→b and a→c 10 each (H(a) = 1 bit),
      // b→a and c→a deterministic (H = 0); π(a) = 20/40 = 0.5
      val seq = (0 until 10).flatMap(k =>
        Seq("a", "b", "a", "c").zipWithIndex.map { case (t, j) =>
          (1L, (4 * k + j).toLong, t)
        }) :+ ((1L, 40L, "a"))
      val out = Cohorts.entropyRate(eventsDf(seq))
        .collect().map(r => r.getAs[String]("state") -> r).toMap
      assert(out("a").getAs[Long]("n_out") == 20L)
      assert(out("a").getAs[Double]("h_bits") == 1.0)
      assert(out("a").getAs[Double]("pi") == 0.5)
      assert(out("a").getAs[Double]("rate_contrib_bits") == 0.5)
      assert(out("b").getAs[Double]("h_bits") == 0.0)
      assert(out("c").getAs[Double]("rate_contrib_bits") == 0.0)
    }
  }

  describe("qlmTopK") {
    it("matches the hand-quantized Dirichlet scores and ranks by tf") {
      val docs = Seq(
        (1L, ("spark " * 2 + "fill " * 8).trim),
        (2L, ("spark " + "fill " * 9).trim),
        (3L, "aaaa bbbb")).toDF("doc_id", "text")
      val out = TextAnalysis.qlmTopK(docs, "doc_id", "text",
        terms = Seq("spark", "vector", "stream", "hash"))
        .collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
      // exact mirror of the engine arithmetic: ctf(spark)=3, |C|=22
      def score(tf: Long, dl: Long): Double = {
        val c9 = math.floor(
          math.log((tf + 2000.0 * 3.0 / 22.0) / (dl + 2000.0)) * 1e9 + 0.5)
        math.floor(c9 / 1e9 * 1e6 + 0.5) / 1e6
      }
      assert(out(0).getAs[Double]("qlm_score") == score(2L, 10L))
      assert(out(1).getAs[Double]("qlm_score") == score(1L, 10L))
      assert(out.forall(_.getAs[Long]("n_matched") == 1L))
    }
  }

  describe("hhiConcentration") {
    it("computes the exact index and top share") {
      val bars = Seq(
        ("A", "2024-01-02", 60L), ("B", "2024-01-02", 20L),
        ("C", "2024-01-02", 20L),
        ("A", "2024-01-03", 70L)).toDF("symbol", "d", "volume")
        .withColumn("trade_date", to_date(col("d"))).drop("d")
      val out = DailyAnalytics.hhiConcentration(bars)
        .collect().map(r => r.getAs[java.sql.Date]("trade_date").toString -> r).toMap
      assert(out("2024-01-02").getAs[Long]("n_symbols") == 3L)
      assert(out("2024-01-02").getAs[Double]("hhi") == 0.44)
      assert(out("2024-01-02").getAs[Double]("top_share") == 0.6)
      assert(out("2024-01-03").getAs[Double]("hhi") == 1.0)
    }
  }
}
