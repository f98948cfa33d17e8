package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Cohorts, DailyAnalytics, Ranking}

/** Grouped ranking, cohort retention, and the pairwise correlation
  * matrix — hand-computed golden values. */
class RankingCohortsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("Ranking.topKPerGroup") {
    it("keeps exactly k rows per group in rank order, ties broken by the order columns") {
      val df = Seq(
        ("a", 1L, 30.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 10.0),
        ("b", 5L, 5.0))
        .toDF("grp", "id", "price")
      val top2 = Ranking.topKPerGroup(df, Seq("grp"),
        Seq($"price".desc, $"id".asc), k = 2)
        .select("grp", "rnk", "id").as[(String, Int, Long)].collect().toSet
      // price 30 tie between id 1 and 3 -> id order decides
      assert(top2 == Set(("a", 1, 1L), ("a", 2, 3L), ("b", 1, 5L)))
    }
  }

  describe("Cohorts.cohortRetention") {
    it("counts day-N returners against the distinct user-day grain") {
      val ev = Seq(
        (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"), // dup events, one active-day
        (1L, "2024-01-08 09:00:00"), // user 1 retained from 01-01
        (2L, "2024-01-01 12:00:00")) // user 2 not retained
        .toDF("user_id", "ts_s")
        .withColumn("event_time", to_timestamp($"ts_s"))
      val out = Cohorts.cohortRetention(ev, "user_id", "event_time", horizonDays = 7)
        .collect()
        .map(r => r.getAs[java.sql.Date]("cohort_date").toString ->
          (r.getAs[Long]("n_active"), r.getAs[Long]("n_retained"),
            r.getAs[Double]("retention_rate"))).toMap
      assert(out("2024-01-01") == ((2L, 1L, 0.5)))
      assert(out("2024-01-08") == ((1L, 0L, 0.0)))
    }
  }

  describe("Cohorts.funnel") {
    it("enforces strict min-after ordering, not mere membership") {
      val ev = Seq(
        // user 1: full ordered funnel
        (1L, "view", "2024-01-01 10:00:00"),
        (1L, "click", "2024-01-01 11:00:00"),
        (1L, "purchase", "2024-01-01 12:00:00"),
        // user 2: clicked BEFORE viewing -> stops at view
        (2L, "click", "2024-01-01 09:00:00"),
        (2L, "view", "2024-01-01 10:00:00"),
        // user 3: view + click, no purchase
        (3L, "view", "2024-01-01 08:00:00"),
        (3L, "click", "2024-01-01 09:30:00"),
        // user 4: purchase only -> never enters
        (4L, "purchase", "2024-01-01 07:00:00"))
        .toDF("user_id", "event_type", "ts_s")
        .withColumn("event_time", to_timestamp($"ts_s"))
      val out = Cohorts.funnel(ev, "user_id", "event_type", "event_time",
        Seq("view", "click", "purchase"))
        .orderBy("step")
        .collect().map(r => (r.getAs[String]("step_name"), r.getAs[Long]("n_users")))
      assert(out.toSeq == Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
    }
  }

  describe("Profiling.rateAnomaly") {
    it("flags a planted spike against a full 24h baseline and skips short baselines") {
      // hours 0..23: 1 event each (baseline); hour 24: normal; hour 25: 5-event burst
      val rows = (0 until 24).map(h => (f"2024-05-01 $h%02d:10:00", "t")) ++
        Seq(("2024-05-02 00:10:00", "t")) ++
        (1 to 5).map(m => (f"2024-05-02 01:0$m:00", "t"))
      val ev = rows.toDF("ts_s", "event_type")
        .withColumn("event_time", to_timestamp($"ts_s"))
      val out = graft.operators.Profiling
        .rateAnomaly(ev, "event_type", "event_time", lookback = 24, sigmas = 3)
        .orderBy("h").collect()
      // only the two post-baseline hours emit (c = 24 filter)
      assert(out.length == 2)
      assert(out(0).getAs[Long]("n") == 1 && !out(0).getAs[Boolean]("is_spike"))
      assert(out(1).getAs[Long]("n") == 5 && out(1).getAs[Boolean]("is_spike"))
    }
  }

  describe("DailyAnalytics.pairCorrelation") {
    it("scores linear dependence at ±1.0 from integer sums") {
      val d = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
      def rows(sym: String, mult: Double) =
        d.zip(Seq(1.0, 2.0, -1.0, 3.0)).map { case (ds, x) => (sym, ds, x * mult) }
      val returns = (rows("A", 1.0) ++ rows("B", 2.0) ++ rows("C", -1.0))
        .toDF("symbol", "ds", "daily_return_pct")
        .withColumn("trade_date", to_date($"ds")).drop("ds")
      val m = DailyAnalytics.pairCorrelation(returns, minDays = 2)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("return_corr"))
        .toMap
      assert(m(("A", "B")) == 1.0)
      assert(m(("A", "C")) == -1.0)
      assert(m(("B", "C")) == -1.0)
    }
  }

  describe("Profiling.distributionDrift") {
    import graft.operators.Profiling
    it("identical distributions have zero drift; disjoint ones have drift 1") {
      val a = (1 to 40).map(i => (i % 4) * 10L).toDF("v")
      val same = Profiling.distributionDrift(a, a, col("v"), 0L, 40L, 4)
        .collect().head
      assert(same.getAs[Double]("drift_tvd") == 0.0)
      assert(same.getAs[Long]("n_a") == 40L && same.getAs[Long]("n_b") == 40L)
      val lo = (1 to 10).map(_ => 5L).toDF("v")   // all bucket 0
      val hi = (1 to 30).map(_ => 35L).toDF("v")  // all bucket 3
      val far = Profiling.distributionDrift(lo, hi, col("v"), 0L, 40L, 4)
        .collect().head
      assert(far.getAs[Double]("drift_tvd") == 1.0)
      assert(far.getAs[Long]("buckets_a") == 1L && far.getAs[Long]("buckets_b") == 1L)
    }
    it("matches the hand TVD on a skewed pair") {
      // a: 3 in b0, 1 in b1 (n=4); b: 1 in b0, 3 in b1 (n=4)
      val a = Seq(1L, 2L, 3L, 15L).toDF("v")
      val b = Seq(1L, 15L, 16L, 17L).toDF("v")
      val r = Profiling.distributionDrift(a, b, col("v"), 0L, 20L, 2)
        .collect().head
      // TVD = (|3*4-1*4| + |1*4-3*4|)/(2*4*4) = 16/32 = 0.5
      assert(r.getAs[Double]("drift_tvd") == 0.5)
    }
  }

  describe("Profiling.tierSummary") {
    import graft.operators.Profiling
    import org.apache.spark.sql.expressions.Window

    /** The single-task formulation the distributed ranking must equal. */
    def viaNtile(df: org.apache.spark.sql.DataFrame, tiles: Int) = {
      val w = Window.orderBy(col("total").desc, col("k"))
      df.groupBy(col("k")).agg(sum(col("v")).as("total"))
        .withColumn("tier", ntile(tiles).over(w))
        .groupBy("tier")
        .agg(count(lit(1)).as("n_keys"), sum(col("total")).as("tier_total"),
          min(col("total")).as("tier_floor"), max(col("total")).as("tier_ceiling"))
        .orderBy("tier")
    }

    it("distributed rank + closed-form tile == global ntile (uneven n % tiles)") {
      // 23 keys over 10 tiles: first 3 tiles get 3 keys, the rest 2
      val df = (1 to 23).flatMap(k => Seq((s"k$k", k.toLong), (s"k$k", 100L - k)))
        .toDF("k", "v")
      val got = Profiling.tierSummary(df, "k", col("v"), tiles = 10).collect()
      val want = viaNtile(df, 10).collect()
      assert(got.toSeq == want.toSeq)
      assert(got.map(_.getAs[Long]("n_keys")).toSeq == Seq(3L, 3L, 3L, 2L, 2L, 2L, 2L, 2L, 2L, 2L))
    }

    it("fewer keys than tiles: one key per tile, tiles beyond n empty") {
      val df = Seq(("a", 5L), ("b", 9L), ("c", 1L)).toDF("k", "v")
      val got = Profiling.tierSummary(df, "k", col("v"), tiles = 10).collect()
      val want = viaNtile(df, 10).collect()
      assert(got.toSeq == want.toSeq)
      assert(got.length == 3)
      assert(got.map(_.getAs[Int]("tier")).toSeq == Seq(1, 2, 3))
    }
  }

  describe("Cohorts.covariateBalance") {
    it("identical variant distributions balance; a shifted one does not") {
      def ev(user: Long, day: Int, v: Double) =
        (user, s"2024-01-0$day 12:00:00", "purchase", v)
      // variants {0,2} and {1,3} with identical pre-period (days 1-2)
      // value multisets {10, 30} -> SMD 0, balanced
      val rows = Seq(
        ev(0L, 1, 10.0), ev(2L, 1, 30.0), ev(1L, 1, 10.0), ev(3L, 1, 30.0),
        ev(0L, 4, 99.0)) // post-period spend never enters the covariate
        .toDF("user_id", "ts_s", "event_type", "value")
        .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      val got = Cohorts.covariateBalance(rows, "user_id", "ts",
        "event_type", "value").collect().head
      assert(got.getAs[Long]("n0") == 2L && got.getAs[Long]("n1") == 2L)
      assert(got.getAs[Double]("smd") == 0.0)
      assert(got.getAs[Boolean]("balanced"))
      assert(got.getAs[Double]("mean_0") == got.getAs[Double]("mean_1"))
    }
  }

  describe("Cohorts.eventPaths") {
    it("sessionizes on the gap and counts within-session transitions only") {
      // u1: view->click->buy inside one session, then a >30min gap
      // followed by view (no predecessor counts across the cut)
      val rows = Seq(
        (1L, 1L, "view", "2024-01-01 10:00:00"),
        (1L, 2L, "click", "2024-01-01 10:05:00"),
        (1L, 3L, "buy", "2024-01-01 10:10:00"),
        (1L, 4L, "view", "2024-01-01 11:00:00"),
        (2L, 5L, "view", "2024-01-01 09:00:00"),
        (2L, 6L, "click", "2024-01-01 09:10:00"))
        .toDF("user_id", "event_id", "event_type", "d")
        .withColumn("ts", to_timestamp($"d")).drop("d")
      val got = Cohorts.eventPaths(rows, "user_id", "event_type", "ts")
        .orderBy("rank").collect()
      assert(got.map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type"), r.getAs[Long]("n"))).toSeq ==
        Seq(("view", "click", 2L), ("click", "buy", 1L)))
      // the 10:10 buy -> 11:00 view pair spans the session cut: absent
      assert(!got.exists(_.getAs[String]("from_type") == "buy"))
    }
  }

  describe("Cohorts.churnHazard / sampleRatioCheck") {
    it("life-table counts: censoring, risk sets and hazards on a hand case") {
      // window ends 01-20; u1 spans 01..05 (dur 4, churned), u2 spans
      // 01..20 (dur 19, censored), u3 one-day 01-10 (dur 0, churned)
      val ev = Seq(
        (1L, "2024-01-01"), (1L, "2024-01-05"),
        (2L, "2024-01-01"), (2L, "2024-01-20"),
        (3L, "2024-01-10"))
        .toDF("user_id", "d").withColumn("ts", to_timestamp($"d"))
      val got = Cohorts.churnHazard(ev, "user_id", "ts")
        .orderBy("duration").collect()
      assert(got.map(r => (r.getAs[Int]("duration"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_churned"))).toSeq ==
        Seq((0, 3L, 1L), (4, 2L, 1L), (19, 1L, 0L)))
      assert(got(1).getAs[Double]("hazard") == 0.5)
    }
    it("SRM chi-square is the exact (n0-n1)^2/n") {
      val ev = Seq((0L, "a"), (1L, "a"), (2L, "a"), (4L, "a"), (6L, "a"))
        .toDF("user_id", "x")
      val got = Cohorts.sampleRatioCheck(ev, "user_id").collect().head
      // users {0,1,2,4,6}: v0 = 4, v1 = 1 -> chi2 = 9/5 = 1.8
      assert(got.getAs[Long]("n_v0") == 4L && got.getAs[Long]("n_v1") == 1L)
      assert(got.getAs[Double]("chi2") == 1.8)
      assert(!got.getAs[Boolean]("srm_flag"))
    }
  }

  describe("Profiling.giniConcentration") {
    it("uniform values give 0; a 0/x pair gives 0.5; all-in-one approaches 1") {
      val df = Seq(
        ("u", 1L, 100L), ("u", 2L, 100L), ("u", 3L, 100L),
        ("h", 1L, 0L), ("h", 2L, 100L))
        .toDF("grp", "k", "cents")
      val got = graft.operators.Profiling
        .giniConcentration(df, "grp", "k", col("cents"))
        .orderBy("grp").collect()
      assert(got(0).getAs[String]("grp") == "h" && got(0).getAs[Double]("gini") == 0.5)
      assert(got(1).getAs[String]("grp") == "u" && got(1).getAs[Double]("gini") == 0.0)
    }
  }

  describe("Cohorts.cupedLift") {
    // 4-day span 01..05 => cutoff = 01-01 + 2 = 01-03; pre = {01,02},
    // post = {03,04,05}
    def ev(user: Long, day: Int, typ: String, v: Double) =
      (user, s"2024-01-0$day 12:00:00", typ, v)

    it("theta=1 when Y == X, and CUPED centers the variant means") {
      // y_c == x_c per user => cov(X,Y) = var(X) => theta = 1; the
      // adjusted mean becomes mean_y - (mean_x_v - xbar_pool)
      val rows = Seq(
        ev(0L, 1, "purchase", 10.0), ev(0L, 4, "purchase", 10.0),
        ev(1L, 1, "purchase", 30.0), ev(1L, 4, "purchase", 30.0),
        ev(2L, 2, "purchase", 20.0), ev(2L, 5, "purchase", 20.0),
        ev(3L, 2, "purchase", 40.0), ev(3L, 5, "purchase", 40.0),
        ev(3L, 3, "view", 99.0)) // non-purchase never counts
        .toDF("user_id", "ts_s", "event_type", "value")
        .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      val got = Cohorts.cupedLift(rows, "user_id", "ts", "event_type", "value")
        .orderBy("variant").collect()
      assert(got.length == 2)
      assert(got.forall(_.getAs[Double]("theta") == 1.0))
      // variant 0: users {0,2} mean_y 15; variant 1: users {1,3} mean 35
      assert(got(0).getAs[Double]("mean_y") == 15.0)
      assert(got(1).getAs[Double]("mean_y") == 35.0)
      // xbar_pool = 25 => both adjusted means collapse to 25
      assert(got.forall(_.getAs[Double]("mean_y_cuped") == 25.0))
    }
    it("zero-variance covariate degrades to theta=0 (raw means)") {
      val rows = Seq(
        ev(0L, 1, "purchase", 10.0), ev(0L, 4, "purchase", 12.0),
        ev(1L, 1, "purchase", 10.0), ev(1L, 4, "purchase", 18.0))
        .toDF("user_id", "ts_s", "event_type", "value")
        .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      val got = Cohorts.cupedLift(rows, "user_id", "ts", "event_type", "value")
        .orderBy("variant").collect()
      assert(got.forall(_.getAs[Double]("theta") == 0.0))
      assert(got.map(r => r.getAs[Double]("mean_y_cuped")).toSeq ==
        got.map(r => r.getAs[Double]("mean_y")).toSeq)
    }
  }

  describe("Cohorts.diffInDiff") {
    it("recovers the planted treatment effect exactly") {
      // control: 1.0 pre, 2.0 post; treated: 1.0 pre, 4.0 post
      // => DiD = (4-1) - (2-1) = 2.0. Midpoint of [0h, 10h] = 5h.
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      val rows = Seq(
        (2L, ts(0), 1.0), (2L, ts(10), 2.0),  // control (even)
        (4L, ts(0), 1.0), (4L, ts(10), 2.0),
        (1L, ts(0), 1.0), (1L, ts(10), 4.0),  // treated (odd)
        (3L, ts(0), 1.0), (3L, ts(10), 4.0))
        .toDF("user_id", "event_time", "value")
      val r = Cohorts.diffInDiff(rows).collect().head
      assert(r.getAs[Long]("n_events") == 8L)
      assert(r.getAs[Double]("treat_pre") == 1.0)
      assert(r.getAs[Double]("treat_post") == 4.0)
      assert(r.getAs[Double]("ctrl_pre") == 1.0)
      assert(r.getAs[Double]("ctrl_post") == 2.0)
      assert(r.getAs[Double]("did") == 2.0)
    }
  }

  describe("Cohorts.msprtMonitor") {
    it("identical arms keep the anytime p at 1 and p is nonincreasing") {
      def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
      // same values in both arms every day; a little spread so sigma2 > 0
      val rows = for (d <- 1 to 10; u <- 1L to 4L; h <- Seq(1, 13))
        yield (u, ts(d, h), if (h == 1) 10.0 else 20.0)
      val got = Cohorts.msprtMonitor(rows.toDF("user_id", "event_time", "value"))
        .orderBy("day").collect()
      assert(got.length == 10)
      got.foreach { r =>
        assert(r.getAs[Double]("delta") == 0.0)
        assert(r.getAs[Double]("p_always_valid") == 1.0)
      }
      val ps = got.map(_.getAs[Double]("p_always_valid")).toSeq
      assert(ps == ps.sorted.reverse) // monotone nonincreasing
    }
    it("a persistent lift drives the anytime p down") {
      def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 01:00:00")
      val rows = for (d <- 1 to 20; u <- 1L to 40L)
        yield (u, ts(d), if (u % 2 == 1) 30.0 else 10.0)
      val got = Cohorts.msprtMonitor(rows.toDF("user_id", "event_time", "value"))
        .orderBy("day").collect()
      val pLast = got.last.getAs[Double]("p_always_valid")
      val pFirst = got.head.getAs[Double]("p_always_valid")
      assert(pLast < pFirst && pLast < 0.05)
    }
  }

  describe("Cohorts.kaplanMeier") {
    it("computes the textbook product-limit curve with censoring") {
      def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
      // u1: hours 12-13 of day 1 then gone (churn at t=1h); u2: active
      // through the panel end (censored, never an event); u3: one hour
      // only (churn at t=0). S(0) = 1 - 1/3; S(1) = (2/3)(1/2) = 1/3.
      val rows = Seq(
        (1L, ts(1, 12)), (1L, ts(1, 13)),
        (2L, ts(1, 12)), (2L, ts(30, 12)),
        (3L, ts(1, 12)))
        .toDF("user_id", "event_time")
      val got = Cohorts.kaplanMeier(rows).orderBy("t_hours").collect()
      assert(got.length == 2)
      assert(got(0).getAs[Long]("t_hours") == 0L)
      assert(got(0).getAs[Long]("n_risk") == 3L)
      assert(got(0).getAs[Long]("n_churned") == 1L)
      assert(got(0).getAs[Double]("survival") == 0.6667)
      assert(got(1).getAs[Long]("t_hours") == 1L)
      assert(got(1).getAs[Long]("n_risk") == 2L)
      assert(got(1).getAs[Double]("survival") == 0.3333)
    }
  }

  describe("Cohorts.markovTransitions") {
    it("recovers exact conditional transition probabilities") {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      val rows = Seq(
        (1L, 10L, "a", ts(1)), (1L, 11L, "b", ts(2)),
        (1L, 12L, "a", ts(3)), (1L, 13L, "c", ts(4)),
        (2L, 20L, "b", ts(1)), (2L, 21L, "a", ts(2)))
        .toDF("user_id", "event_id", "event_type", "event_time")
      val got = Cohorts.markovTransitions(rows)
        .collect().map(r => (r.getAs[String]("cur"), r.getAs[String]("nxt")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
      assert(got(("a", "b")) == (1L, 0.5))
      assert(got(("a", "c")) == (1L, 0.5))
      assert(got(("b", "a")) == (2L, 1.0))
    }
  }

  describe("Cohorts.mantelHaenszel") {
    it("recovers per-stratum and pooled risk ratios from planted cells") {
      // stratum 0: treated u=1 converts, control u=2 does not;
      // stratum 1 (u div 2 % 3 == 1): treated u=3 no, control u=4 no... build
      // explicit: users 1(t),2(c) in stratum 0; 3(t),5(t),2? keep simple:
      // users 1,3 treated / 2,4 control all in one stratum via ids 1,2 (s0) and 7,8 (s1? 7//2=3%3=0)
      // use ids chosen so stratum = (u div 2) % 3: u=1->0, u=2->1, u=3->1, u=4->2, u=5->2, u=6->0, u=7->0
      val ev = Seq(
        (1L, "purchase"), (6L, "view"),   // stratum 0: treated u1 conv; control u6 not
        (2L, "view"), (3L, "purchase"),   // stratum 1: control u2 not; treated u3 conv
        (4L, "purchase"), (5L, "view"))   // stratum 2: control u4 conv; treated u5 not
        .toDF("user_id", "event_type")
      val got = Cohorts.mantelHaenszel(
        ev.withColumn("segment", expr("(user_id div 2) % 3")), "segment")
        .orderBy("stratum").collect()
      assert(got.length == 3)
      val s0 = got(0)
      assert(s0.getAs[Long]("conv_treat") == 1L && s0.getAs[Long]("n_treat") == 1L)
      assert(s0.getAs[Long]("conv_ctrl") == 0L && s0.getAs[Long]("n_ctrl") == 1L)
      assert(s0.isNullAt(s0.fieldIndex("rr_stratum"))) // 1/0 -> NULL
      // pooled: num = 1*1/2 + 1*1/2 + 0 = 1.0; den = 0 + 0 + 1*1/2 = 0.5
      assert(s0.getAs[Double]("rr_pooled") == 2.0)
    }
  }
}
