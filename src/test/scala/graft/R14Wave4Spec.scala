package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Cohorts, DailyAnalytics, TextAnalysis}

/** Golden coverage for the round-14 wave-4 operators: Cohen's kappa,
  * day-of-week ANOVA, and McNemar's paired test. */
class R14Wave4Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("cohensKappa") {
    // "the of and" hits only the en stopword list; "les est et" only fr
    val en = "the of and"
    val fr = "les est et"
    it("is 1 on perfect label/prediction agreement") {
      val docs = ((1 to 10).map(i => (i.toLong, "en", en)) ++
        (11 to 20).map(i => (i.toLong, "fr", fr))).toDF("doc_id", "lang", "text")
      val r = TextAnalysis.cohensKappa(docs, "lang", "text").collect().head
      assert(r.getAs[Long]("n_docs") == 20L)
      assert(r.getAs[Long]("n_agree") == 20L)
      assert(r.getAs[Double]("p_o") == 1.0)
      assert(r.getAs[Double]("kappa") == 1.0)
    }
    it("is 0 when labels are independent of predictions") {
      val docs = (
        (1 to 5).map(i => (i.toLong, "en", en)) ++
        (6 to 10).map(i => (i.toLong, "en", fr)) ++
        (11 to 15).map(i => (i.toLong, "fr", en)) ++
        (16 to 20).map(i => (i.toLong, "fr", fr))).toDF("doc_id", "lang", "text")
      val r = TextAnalysis.cohensKappa(docs, "lang", "text").collect().head
      assert(r.getAs[Double]("p_o") == 0.5)
      assert(r.getAs[Double]("p_e") == 0.5)
      assert(r.getAs[Double]("kappa") == 0.0)
    }
  }

  describe("anovaDow") {
    it("recovers the exact F on a hand-built two-weekday panel") {
      // Mondays: +1/−1 ×10 (S=0, Q=2e9); Tuesdays: +3/+1 ×10
      // (S=4e5, Q=1e10) → SSB=40, SSW=40, F=(40/1)/(40/38)=38, η²=0.5
      val mondays = (0 until 10).map(k => java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusWeeks(k)))
      val tuesdays = (0 until 10).map(k => java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 2).plusWeeks(k)))
      val rows =
        mondays.map(d => ("S1", d, 1.0)) ++ mondays.map(d => ("S2", d, -1.0)) ++
        tuesdays.map(d => ("S1", d, 3.0)) ++ tuesdays.map(d => ("S2", d, 1.0))
      val r = DailyAnalytics.anovaDow(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(r.getAs[Long]("n_days") == 40L)
      assert(r.getAs[Long]("k_groups") == 2L)
      assert(r.getAs[Double]("ss_between") == 40.0)
      assert(r.getAs[Double]("ss_within") == 40.0)
      assert(r.getAs[Double]("f_stat") == 38.0)
      assert(r.getAs[Double]("eta_sq") == 0.5)
    }
  }

  describe("mcnemar") {
    it("counts discordant pairs exactly and gates significance all-integer") {
      def journey(uid: Long, types: Seq[String]) =
        types.zipWithIndex.map { case (t, i) => (uid, (uid * 100 + i), t) }
      val rows =
        (1L to 4L).flatMap(u => journey(u, Seq("purchase", "view"))) ++ // lost
        journey(5L, Seq("view", "purchase")) ++                         // gained
        (6L to 7L).flatMap(u => journey(u, Seq("purchase", "purchase"))) ++
        (8L to 10L).flatMap(u => journey(u, Seq("view", "view")))
      val df = rows.toDF("user_id", "event_id", "event_type")
        .withColumn("event_time", expr("timestamp_seconds(event_id)"))
      val r = Cohorts.mcnemar(df).collect().head
      assert(r.getAs[Long]("n_users") == 10L)
      assert(r.getAs[Long]("n_lost") == 4L)
      assert(r.getAs[Long]("n_gained") == 1L)
      assert(r.getAs[Long]("n_both") == 2L)
      assert(r.getAs[Long]("n_neither") == 3L)
      assert(r.getAs[Double]("chi2") == 1.8) // (4−1)²/5
      assert(!r.getAs[Boolean]("significant")) // 9·10⁴ < 38415·5
    }
  }
}
