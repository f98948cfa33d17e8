package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Cohorts, DailyAnalytics, Graph}

/** Golden coverage for the round-15 wave-3 operators: Cochran's Q,
  * Friedman/Page across weekdays, and the bounded k-truss peel. */
class R15Wave3Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("cochranQ") {
    it("matches the hand-computed Q on a 4-user two-treatment panel") {
      // u1:{A} u2:{A} u3:{A,B} u4:{A,B}: C=(4,2), N=6, SC2=20, SR2=10
      // Q = (k-1)(k*SC2 - N^2)/(kN - SR2) = 1*(40-36)/(12-10) = 2
      val ev = Seq((1L, "A"), (2L, "A"), (3L, "A"), (3L, "B"),
        (4L, "A"), (4L, "B"), (4L, "B")) // duplicate mark collapses
        .toDF("user_id", "event_type")
      val out = Cohorts.cochranQ(ev).collect().head
      assert(out.getAs[Long]("n_users") == 4L)
      assert(out.getAs[Long]("k_treatments") == 2L)
      assert(out.getAs[Long]("n_marks") == 6L)
      assert(out.getAs[Double]("q") == 2.0, s"$out")
      // gate NULLs when k != expectK (wrong chi^2 df otherwise)
      assert(out.isNullAt(out.fieldIndex("significant")))
    }
    it("identical per-type conversion gives Q = 0") {
      val ev = (1L to 6L).flatMap(u => Seq((u, "A"), (u, "B"), (u, "C")))
        .toDF("user_id", "event_type")
      val out = Cohorts.cochranQ(ev).collect().head
      assert(out.getAs[Double]("q") == 0.0, s"$out")
    }
  }

  describe("friedmanDow") {
    it("perfect weekday concordance hits the chi2 maximum n(k-1)") {
      // every symbol ranks the weekdays identically (return is a
      // strictly increasing function of the ISO day-of-week), 3 full
      // weeks -> complete blocks, chi2_F = n(k-1) = 18, significant
      val rows = for {
        s <- Seq("A", "B", "C")
        d <- 0 until 21
      } yield {
        val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
        (s, java.sql.Date.valueOf(date), 0.01 * date.getDayOfWeek.getValue)
      }
      val out = DailyAnalytics.friedmanDow(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(out.getAs[Long]("n_blocks") == 3L)
      assert(out.getAs[Long]("k_treatments") == 7L)
      assert(out.getAs[Double]("chi2_f") == 18.0, s"$out")
      assert(out.getAs[Boolean]("significant"), s"$out")
      // Page's L pairs Spark's Sunday-1 labels with the ISO-ordered
      // ranks: L = n * (2*1+3*2+4*3+5*4+6*5+7*6+1*7) = 3 * 119
      assert(out.getAs[Long]("page_l") == 357L, s"$out")
    }
    it("an all-tie panel follows the documented dow-tiebreak convention (concordant ranks)") {
      // constant returns: every block value ties, so ranks follow the
      // dow tiebreak identically per symbol — the documented
      // total-order convention makes ties CONCORDANT (chi2 = n(k-1)),
      // pinned here so the convention can't drift silently
      val rows = for {
        s <- Seq("A", "B")
        d <- 0 until 21
      } yield (s, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d)), 0.5)
      val out = DailyAnalytics.friedmanDow(
        rows.toDF("symbol", "trade_date", "daily_return_pct")).collect().head
      assert(out.getAs[Double]("chi2_f") == 12.0, s"$out") // n(k-1) = 2*6
    }
    it("stays lazy: constructing the frame runs no Spark job, and k is data-driven") {
      val tracker = spark.sparkContext.statusTracker
      val before = tracker.getJobIdsForGroup(null).length
      val rows = Seq(("A", java.sql.Date.valueOf("2024-01-01"), 0.5))
      val df = DailyAnalytics.friedmanDow(
        rows.toDF("symbol", "trade_date", "daily_return_pct"))
      assert(tracker.getJobIdsForGroup(null).length == before,
        "friedmanDow construction must not run an eager Spark action")
      // k re-derives at EXECUTION time from the plan's own aggregate
      assert(df.collect().head.getAs[Long]("k_treatments") == 1L)
    }
  }

  describe("kTruss") {
    it("keeps a 4-clique, peels pendants and lone triangles") {
      // K4 on {1,2,3,4}: every edge in 2 triangles — survives k=4.
      // Pendant 4-5: support 0. Triangle {5,6,7}: support 1 each.
      val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      val extra = Seq((4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L))
      val out = Graph.kTruss((k4 ++ extra).toDF("u", "v"), "u", "v")
        .orderBy("u", "v")
        .as[(Long, Long, Long)].collect().toSeq
      assert(out == k4.map { case (u, v) => (u, v, 2L) },
        s"got $out")
    }
    it("is idempotent once converged and empty below any triangle") {
      val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
      // a lone triangle has support 1 everywhere: 4-truss empties it
      assert(Graph.kTruss(tri, "u", "v").isEmpty)
      // but it IS the full 3-truss (support >= 1)
      val k3 = Graph.kTruss(tri, "u", "v", k = 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(k3 == Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)))
    }
  }
}
