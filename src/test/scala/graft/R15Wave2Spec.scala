package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Profiling}

/** Golden/invariant coverage for the round-15 wave-2 operators:
  * Corwin–Schultz high-low spread and the t-closeness audit. */
class R15Wave2Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("corwinSchultz") {
    def barsOf(hl: Seq[(Double, Double)]) = hl.zipWithIndex.map { case ((h, l), i) =>
      ("S0", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), h, l)
    }.toDF("symbol", "trade_date", "high_price", "low_price")

    it("zero ranges give zero spread; a constant pure-spread range matches the closed form") {
      val flat = DailyAnalytics.corwinSchultz(
        barsOf(Seq.fill(40)((100.0, 100.0)))).collect().head
      assert(flat.getAs[Double]("cs_spread_pct") == 0.0)
      // constant H/L with zero drift: the 2-day range equals the 1-day
      // range, so gamma = ln^2(H/L) and beta = 2 gamma — closed form
      val out = DailyAnalytics.corwinSchultz(
        barsOf(Seq.fill(40)((101.0, 100.0)))).collect().head
      val g = math.pow(math.log(101.0 / 100.0), 2)
      val b = 2 * g
      val k = 3.0 - 2.0 * math.sqrt(2.0)
      val a = (math.sqrt(2 * b) - math.sqrt(b)) / k - math.sqrt(g / k)
      val s = 2.0 * (math.exp(a) - 1.0) / (1.0 + math.exp(a))
      assert(math.abs(out.getAs[Double]("cs_spread_pct") - s * 100.0) < 1e-3,
        s"got $out want ${s * 100}")
      assert(out.getAs[Double]("pct_positive") == 1.0)
    }
  }

  describe("tCloseness") {
    it("uniform classes score 0; a fully skewed binary split scores 0.5 each") {
      // two classes, each concentrated on one of two global 50/50 values
      val skew = Seq(("en", "a", 100L), ("en", "a", 150L),
        ("de", "b", 10L), ("de", "b", 50L))
        .toDF("lang", "source", "n_chars")
      val out = Profiling.tCloseness(skew, Seq("lang", "source"),
        expr("n_chars div 100")).collect().head
      assert(out.getAs[Long]("n_classes") == 2L)
      assert(out.getAs[Long]("m_values") == 2L)
      assert(out.getAs[Double]("max_emd") == 0.5, s"$out")
      assert(out.getAs[Long]("n_violating") == 2L)
      assert(out.getAs[Long]("n_exposed_rows") == 4L)
      // both classes mirroring the global distribution -> EMD 0
      val unif = Seq(("en", "a", 100L), ("en", "a", 10L),
        ("de", "b", 150L), ("de", "b", 50L))
        .toDF("lang", "source", "n_chars")
      val out2 = Profiling.tCloseness(unif, Seq("lang", "source"),
        expr("n_chars div 100")).collect().head
      assert(out2.getAs[Double]("max_emd") == 0.0, s"$out2")
      assert(out2.getAs[Long]("n_violating") == 0L)
    }
  }
}
