package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Profiling, Sampling, TickAnalytics}

/** Golden/invariant coverage for the round-15 wave operators: Theil/
  * MLD/Atkinson inequality, seasonal-naive MASE, tick-grain price
  * impact, and the fixed-k hash reservoir sample. */
class R15WaveSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("theilInequality") {
    it("scores 0 on perfect equality and ln(n) Theil-T under total concentration") {
      val eq = Profiling.theilInequality(
        (1 to 8).map(k => (k.toLong, 2500L)).toDF("k", "cents"),
        "k", col("cents")).collect().head
      assert(eq.getAs[Long]("n_keys") == 8L)
      assert(eq.getAs[Long]("n_excluded") == 0L)
      assert(eq.getAs[Double]("theil_t") == 0.0)
      assert(eq.getAs[Double]("mld") == 0.0)
      assert(eq.getAs[Double]("atkinson_1") == 0.0)
      // one key holds everything except epsilon crumbs: Theil-T → ln n
      // (here: 9 keys, one with ~all mass; bound is ln 9 ≈ 2.197)
      val conc = Profiling.theilInequality(
        ((1 to 8).map(k => (k.toLong, 1L)) :+ (9L, 1000000L))
          .toDF("k", "cents"),
        "k", col("cents")).collect().head
      assert(conc.getAs[Double]("theil_t") > 2.0 &&
        conc.getAs[Double]("theil_t") <= math.log(9.0) + 1e-6)
      assert(conc.getAs[Double]("atkinson_1") > 0.9 &&
        conc.getAs[Double]("atkinson_1") < 1.0)
      // MLD dominates nothing: all three indices non-negative always
      assert(conc.getAs[Double]("mld") >= 0.0)
    }
    it("excludes non-positive keys and reports them") {
      val out = Profiling.theilInequality(
        Seq((1L, 100L), (2L, 300L), (3L, 0L), (4L, -50L)).toDF("k", "cents"),
        "k", col("cents")).collect().head
      assert(out.getAs[Long]("n_keys") == 2L)
      assert(out.getAs[Long]("n_excluded") == 2L)
      assert(out.getAs[Long]("total_cents") == 400L)
    }
  }

  describe("maseSeasonalNaive") {
    def barsOf(closes: Seq[Long]) = closes.zipWithIndex.map { case (c, i) =>
      ("S0", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        c / 100.0)
    }.toDF("symbol", "trade_date", "close_price")

    it("MASE = 1/5 on a linear ramp (naive-1 error b, seasonal error 5b)") {
      val out = DailyAnalytics.maseSeasonalNaive(
        barsOf((0 until 40).map(i => 10000L + 20L * i))).collect().head
      assert(out.getAs[Long]("n_scored") == 35L)
      assert(out.getAs[Double]("mae_naive") == 0.20)
      assert(out.getAs[Double]("mae_seasonal") == 1.00)
      assert(out.getAs[Double]("mase") == 0.2)
    }
    it("MASE is large on a pure period-5 cycle (seasonal-naive is perfect)") {
      val season = Seq(100L, -50L, 25L, -75L, 0L)
      val out = DailyAnalytics.maseSeasonalNaive(
        barsOf((0 until 40).map(t => 10000L + season(t % 5)))).collect()
      // seasonal SAE is exactly 0 → mase NULL (0 denominator), mae 0
      assert(out.head.getAs[Double]("mae_seasonal") == 0.0)
      assert(out.head.isNullAt(out.head.fieldIndex("mase")))
      assert(out.head.getAs[Double]("mae_naive") > 0.0)
    }
  }

  describe("tickImpactPanel") {
    def ticksDf(rows: Seq[(String, Long, Double)]) =
      rows.toDF("symbol", "event_id", "price")
        .withColumn("ts", expr("timestamp_seconds(event_id)"))

    it("efficiency 1 on monotone flow, 0 on a round trip, partial bucket dropped") {
      // 50 monotone upticks (+1 cent each): net = tv = 49 ticks
      val up = (1 to 50).map(i => ("A", i.toLong, 100.00 + i * 0.01))
      // 50 ticks out-and-back (last price returns to the first): net 0
      val rt = (1 to 50).map { i =>
        val p = if (i <= 25) 100.00 + i * 0.01 else 100.00 + (51 - i) * 0.01
        ("B", i.toLong, p)
      }
      // 30 trailing ticks: partial bucket → dropped entirely
      val part = (1 to 30).map(i => ("C", i.toLong, 100.00 + i * 0.01))
      val got = TickAnalytics.tickImpactPanel(ticksDf(up ++ rt ++ part))
        .collect().map(r => r.getAs[String]("symbol") -> r).toMap
      assert(!got.contains("C"), "partial bucket must be dropped")
      assert(got("A").getAs[Long]("n_buckets") == 1L)
      assert(got("A").getAs[Double]("mean_impact") == 0.49)
      assert(got("A").getAs[Double]("impact_efficiency") == 1.0)
      assert(got("B").getAs[Double]("mean_impact") == 0.0)
      assert(got("B").getAs[Double]("impact_efficiency") == 0.0)
    }
    it("cross-bucket deltas never leak into a bucket's total variation") {
      // bucket 1 flat at 100, bucket 2 flat at 200: the +100 jump
      // lands between buckets; both tv must be 0
      val rows = (1 to 100).map(i =>
        ("A", i.toLong, if (i <= 50) 100.00 else 200.00))
      val out = TickAnalytics.tickImpactPanel(ticksDf(rows)).collect().head
      assert(out.getAs[Long]("n_buckets") == 2L)
      assert(out.getAs[Double]("mean_total_variation") == 0.0)
      assert(out.getAs[Double]("mean_impact") == 0.0)
    }
  }

  describe("reservoirFixedK") {
    val df = (1L to 500L).map(i => (i, s"u$i")).toDF("id", "tag")

    it("returns exactly k rows — the bottom-k of the id hash — and nests") {
      val k10 = Sampling.reservoirFixedK(df, "id", 10)
        .select($"id").as[Long].collect().toSet
      val k25 = Sampling.reservoirFixedK(df, "id", 25)
        .select($"id").as[Long].collect().toSet
      assert(k10.size == 10 && k25.size == 25)
      assert(k10.subsetOf(k25), "bottom-k samples must nest")
      // reproducible: same k → same set
      val again = Sampling.reservoirFixedK(df, "id", 10)
        .select($"id").as[Long].collect().toSet
      assert(again == k10)
    }
    it("is stable under growth: new rows only displace the current max") {
      val grown = (1L to 600L).map(i => (i, s"u$i")).toDF("id", "tag")
      val before = Sampling.reservoirFixedK(df, "id", 20)
        .select($"id", $"h").as[(Long, Long)].collect().toMap
      val after = Sampling.reservoirFixedK(grown, "id", 20)
        .select($"id", $"h").as[(Long, Long)].collect().toMap
      // newcomers are new rows only; an evicted id's hash must exceed
      // every surviving hash (it was displaced from the top, the
      // reservoir update rule)
      val evicted = before.keySet -- after.keySet
      val entered = after.keySet -- before.keySet
      assert(entered.forall(id => id > 500L))
      val maxAfterH = after.values.max
      assert(evicted.forall(id => before(id) >= maxAfterH))
    }
  }
}
