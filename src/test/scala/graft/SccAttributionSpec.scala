package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Cohorts, DailyAnalytics, Graph}

/** Invariant coverage for the round-13 operators: SCC on hand-built
  * graphs with known components, Markov removal-effect attribution's
  * probability laws, and Mann–Kendall's exact closed forms on
  * monotone/constant series — semantics the oracle hash alone can't
  * pin (a hash matches ANY consistent pair of implementations; these
  * cases pin the intended math).
  */
class SccAttributionSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("Graph.stronglyConnected") {
    it("separates two 3-cycles bridged by a one-way edge") {
      // 1→2→3→1 and 10→11→12→10, bridge 3→10 (one-way: no merge)
      val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
        (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
      val got = Graph.stronglyConnected(e, "src", "dst", rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
    }

    it("reports singletons on a DAG (no directed cycle ⇒ no SCC ≥ 2)") {
      val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
      val got = Graph.stronglyConnected(e, "src", "dst", rounds = 4).collect()
      assert(got.forall(r => r.getLong(0) == r.getLong(1)))
    }

    it("resolves a long cycle only when rounds cover its radius — the bounded contract") {
      // 8-cycle from node 1: needs 7 forward hops for 1's label to wrap
      val cyc = (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1)).toDF("src", "dst")
      val under = Graph.stronglyConnected(cyc, "src", "dst", rounds = 3)
        .filter(col("id") =!= col("scc_id")).count()
      val full = Graph.stronglyConnected(cyc, "src", "dst", rounds = 8)
        .collect().map(r => r.getLong(1)).distinct
      assert(under < 7, "3 rounds must NOT fully resolve an 8-cycle")
      assert(full.sameElements(Array(1L)), "8 rounds resolve the whole cycle to min id 1")
    }
  }

  describe("Cohorts.markovAbsorption") {
    lazy val out = {
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      Cohorts.markovAbsorption(
        ev.withColumn("event_time", graft.sources.Adapters.eventTime(ev))).collect()
    }

    it("removal can only lose conversion mass, never create it") {
      out.foreach { r =>
        val (full, rem) = (r.getDouble(1), r.getDouble(2))
        assert(rem <= full + 1e-9, s"${r.getString(0)}: removed $rem > full $full")
        val eff = r.getDouble(3)
        assert(eff >= -1e-9 && eff <= 1.0 + 1e-9)
      }
    }

    it("attribution shares are a probability vector (sum ≈ 1 under rd(4))") {
      val total = out.map(_.getDouble(4)).sum
      assert(math.abs(total - 1.0) <= out.length * 5e-5, s"shares sum to $total")
    }
  }

  describe("DailyAnalytics.mannKendall") {
    it("hits the exact closed forms on monotone and constant series") {
      val n = 40
      val mk = (1 to n).flatMap { i =>
        val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString
        Seq(("U", d, 100.0 + i), ("C", d, 100.0))
      }.toDF("symbol", "trade_date", "close_price")
        .withColumn("trade_date", col("trade_date").cast("date"))
      val got = DailyAnalytics.mannKendall(mk, window = 120, minDays = 10)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))).toMap
      val pairs = n.toLong * (n - 1) / 2
      val varFull = n.toLong * (n - 1) * (2L * n + 5)
      assert(got("U") == ((n.toLong, pairs, varFull, "UP")),
        s"strictly increasing: S = n(n-1)/2, no ties, UP — got ${got("U")}")
      // constant: S = 0, the tie term cancels var18 exactly, z null → FLAT
      assert(got("C") == ((n.toLong, 0L, 0L, "FLAT")))
    }
  }

  describe("Enrichment.associationRules") {
    it("rules obey the probability laws and come in directed pairs") {
      val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      val rules = graft.operators.Enrichment.associationRules(li).collect()
      assert(rules.nonEmpty)
      rules.foreach { r =>
        val (nAb, nAnte, nCons) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(nAb <= nAnte && nAb <= nCons, "pair support bounded by item supports")
        val conf = r.getDouble(5)
        assert(conf > 0 && conf <= 1.0, s"confidence $conf out of (0,1]")
        assert(r.getDouble(6) > 0, "lift positive")
      }
      // every undirected pair yields exactly the two directed rules
      val dirs = rules.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dirs.forall { case (a, b) => dirs((b, a)) })
    }
  }

  describe("DailyAnalytics.twoFactorRegression") {
    it("recovers exact loadings when y IS a known combination of the factors") {
      // two symbols define the market; a third moves as 3·mkt, so its
      // joint fit must be beta_mkt = 3, beta_lag = 0, alpha = 0
      val n = 60
      val rows = (1 to n).flatMap { i =>
        val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString
        // deterministic non-periodic driver: an alternating-sign or
        // otherwise lag-collinear pattern would make x2 = ±x1 and the
        // normal equations singular
        val m = ((i * 37) % 13 - 6).toDouble
        Seq(("A", d, 2 * m), ("B", d, 0.0), ("C", d, 3 * m))
      }.toDF("symbol", "trade_date", "daily_return_pct")
        .withColumn("trade_date", col("trade_date").cast("date"))
      // C is part of the index: mkt = (2m + 0 + 3m)/3 = floor-mean of
      // scaled values — to keep the closed form EXACT use only A,B for
      // the index by fitting on a frame where C's weight washes out is
      // messy; instead assert the fit solves the normal equations:
      // residual moments against both regressors vanish (exact OLS law)
      val got = DailyAnalytics.twoFactorRegression(rows, minDays = 10)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(got.keySet == Set("A", "B", "C"))
      // every symbol's returns are exact multiples of the SAME market
      // series (mkt = 5m/3... scaled-floor), so beta_lag ≈ 0 and
      // beta_mkt ratios match the return ratios 2 : 0 : 3
      val (bA, bC) = (got("A")._1, got("C")._1)
      assert(math.abs(got("B")._1) < 1e-9 && math.abs(got("B")._2) < 1e-9)
      assert(math.abs(bC / bA - 1.5) < 1e-3, s"beta ratio ${bC / bA} != 1.5")
      assert(math.abs(got("A")._2) < 1e-3 && math.abs(got("C")._2) < 1e-3,
        "no lagged loading in a contemporaneous-only construction")
    }
  }

  describe("Enrichment.revenueGroupingSets") {
    it("the (year) grand rows equal the (nation, year) rows summed over nations") {
      val gs = graft.operators.Enrichment
        .revenueGroupingSets(spark, "/root/testdata/sf0.001").collect()
      val byNationYear = gs.filter(r => r.getInt(3) == 0 && r.getInt(4) == 0 && r.getInt(5) == 1)
      val byYear = gs.filter(r => r.getInt(3) == 1 && r.getInt(4) == 0 && r.getInt(5) == 1)
      assert(byNationYear.nonEmpty && byYear.nonEmpty)
      val summed = byNationYear.groupBy(_.getInt(1)).view
        .mapValues(rs => (math.round(rs.map(_.getDouble(6)).sum * 100), rs.map(_.getLong(7)).sum))
        .toMap
      byYear.foreach { r =>
        val (rev, cnt) = summed(r.getInt(1))
        assert(math.round(r.getDouble(6) * 100) == rev && r.getLong(7) == cnt,
          s"year ${r.getInt(1)}: rollup mismatch")
      }
    }
  }
}
