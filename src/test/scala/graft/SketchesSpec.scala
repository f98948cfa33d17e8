package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.Sketches
import graft.sources.Tables

class SketchesSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  describe("Sketches") {
    it("per-group estimates are within the HLL error contract of exact distincts") {
      val ev = Tables.events(spark, dir)
      val approx = Sketches.distinctSketchByGroup(ev, Seq("event_type"), "user_id")
        .select($"event_type", $"approx_distinct").as[(String, Long)].collect().toMap
      val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("d"))
        .as[(String, Long)].collect().toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (k, d) =>
        val a = approx(k)
        // lgK=12 rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma + small-count slack
        assert(math.abs(a - d) <= math.max(5, 0.08 * d), s"$k: approx $a vs exact $d")
      }
    }
    it("union-of-parts matches the directly-built global sketch (merge law)") {
      val ev = Tables.events(spark, dir)
      val parts = Sketches.distinctSketchByGroup(ev, Seq("event_type"), "user_id")
      val viaUnion = Sketches.rollupSketches(parts, Seq.empty)
        .select($"approx_distinct").as[Long].head()
      val direct = Sketches.distinctSketchByGroup(
          ev.withColumn("g", lit(1)), Seq("g"), "user_id")
        .select($"approx_distinct").as[Long].head()
      assert(viaUnion == direct,
        s"union-of-parts $viaUnion != direct $direct (same lgK, same universe)")
      // and n_rows sums exactly
      val n = Sketches.rollupSketches(parts, Seq.empty).select($"n_rows").as[Long].head()
      assert(n == ev.count())
    }
    it("estimates are deterministic run to run") {
      val ev = Tables.events(spark, dir)
      def run() = Sketches.distinctSketchByGroup(ev, Seq("event_type"), "user_id")
        .select("event_type", "approx_distinct")
      assert(run().exceptAll(run()).isEmpty)
    }
    it("CMS: merged per-group sketches estimate exactly like one whole-data sketch (linearity)") {
      val docs = Tables.documents(spark, dir)
      val langs = docs.select("lang").distinct().as[String].collect().toSeq.sorted
      val perSource = Sketches.cmsByGroup(docs, Seq("source"), "lang")
        .select("cms").collect().map(_.getAs[Array[Byte]]("cms"))
      val merged = Sketches.cmsMerge(perSource.toIndexedSeq)
      val whole = Sketches.cmsByGroup(docs.withColumn("g", lit(1)), Seq("g"), "lang")
        .select("cms").head().getAs[Array[Byte]]("cms")
      langs.foreach { l =>
        assert(Sketches.cmsEstimate(merged, l) == Sketches.cmsEstimate(whole, l),
          s"linearity broken for '$l'")
      }
    }
    it("CMS: in-plan cms_merge_agg + cms_estimate match the driver-side merge read") {
      val docs = Tables.documents(spark, dir)
      val perSource = Sketches.cmsByGroup(docs, Seq("source"), "lang")
      val merged = Sketches.cmsMerge(
        perSource.select("cms").collect().map(_.getAs[Array[Byte]]("cms")).toIndexedSeq)
      val inPlan = docs.select("lang").distinct()
        .crossJoin(broadcast(
          perSource.agg(call_function("cms_merge_agg", col("cms")).as("cms"))))
        .select($"lang", call_function("cms_estimate", $"cms", $"lang").as("est"))
        .as[(String, Long)].collect().toMap
      assert(inPlan.nonEmpty)
      inPlan.foreach { case (l, est) =>
        assert(est == Sketches.cmsEstimate(merged, l),
          s"in-plan estimate differs from driver-side merge for '$l'")
      }
    }
    it("CMS: cms_estimate's per-instance memoization never leaks across sketches") {
      // one frame carrying MANY different sketches: each row's in-plan
      // estimate must equal the driver-side read of THAT row's sketch
      // (a stale cache would return a neighbor's count)
      val per = Sketches.cmsByGroup(Tables.documents(spark, dir), Seq("source"), "lang")
      val inPlan = per
        .select($"source", call_function("cms_estimate", $"cms", lit("en")).as("e"))
        .as[(String, Long)].collect().toMap
      val direct = per.select($"source", $"cms").collect().map { r =>
        r.getString(0) -> Sketches.cmsEstimate(r.getAs[Array[Byte]]("cms"), "en")
      }.toMap
      assert(inPlan.size >= 2 && inPlan == direct)
    }
    it("CMS: estimates over-approximate exact counts within eps * N") {
      val docs = Tables.documents(spark, dir)
      val whole = Sketches.cmsByGroup(docs.withColumn("g", lit(1)), Seq("g"), "lang",
          eps = 0.001, confidence = 0.99)
        .select("cms").head().getAs[Array[Byte]]("cms")
      val exact = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val n = exact.values.sum
      exact.foreach { case (l, c) =>
        val e = Sketches.cmsEstimate(whole, l)
        assert(e >= c, s"CMS must never under-count: $l est $e < exact $c")
        assert(e <= c + math.max(1, (0.001 * n).ceil.toLong),
          s"$l: est $e beyond eps*N of exact $c")
      }
    }

    it("KLL: sketch quantiles land within the rank-error contract of exact percentiles") {
      val li = Tables.lineitem(spark, dir)
      val n = li.count()
      val sk = Sketches.quantileSketchByGroup(li.withColumn("g", lit(1)), Seq("g"), "l_quantity")
      val got = Sketches.quantilesFromSketch(sk, Seq(0.5, 0.9))
        .select($"kll_n", $"p50", $"p90").as[(Long, Double, Double)].head()
      assert(got._1 == n) // n is tracked exactly
      // k=200 ⇒ ~1.65% rank error: the returned value's true rank must
      // be within eps of the requested rank
      def rankOf(v: Double): Double =
        li.filter($"l_quantity" <= v).count().toDouble / n
      assert(math.abs(rankOf(got._2) - 0.5) <= 0.05, s"p50=${got._2} rank=${rankOf(got._2)}")
      assert(math.abs(rankOf(got._3) - 0.9) <= 0.05, s"p90=${got._3} rank=${rankOf(got._3)}")
    }
    it("KLL: rolled-up per-group sketches answer like the whole-data sketch (n exact, ranks in-bound)") {
      val li = Tables.lineitem(spark, dir)
      val per = Sketches.quantileSketchByGroup(li, Seq("l_returnflag"), "l_quantity")
      val rolled = Sketches.quantileRollup(per, Seq.empty)
      val got = Sketches.quantilesFromSketch(rolled, Seq(0.5))
        .select($"kll_n", $"p50").as[(Long, Double)].head()
      assert(got._1 == li.count())
      val n = li.count()
      val rank = li.filter($"l_quantity" <= got._2).count().toDouble / n
      assert(math.abs(rank - 0.5) <= 0.05, s"merged p50=${got._2} rank=$rank")
    }
    it("approx-top-k: under capacity the sketch counts are exact and the merge law holds") {
      val docs = Tables.documents(spark, dir)
      val per = Sketches.topKSketchByGroup(docs, Seq("source"), "lang")
      val merged = Sketches.topKRollup(per, Seq.empty)
      val got = Sketches.topKFromSketch(merged, Seq.empty, k = 100)
        .select($"item", $"est_count").as[(String, Long)].collect().toMap
      val exact = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(got == exact) // capacity 64 >> distinct langs: no evictions
    }
    it("rejects mixed-precision unions instead of silently degrading") {
      val a = Sketches.distinctSketchByGroup(
        Seq((1L, "x")).toDF("id", "k"), Seq("k"), "id", lgK = 12)
      val b = Sketches.distinctSketchByGroup(
        Seq((2L, "x")).toDF("id", "k"), Seq("k"), "id", lgK = 10)
      val ex = intercept[Exception] {
        Sketches.rollupSketches(a.unionByName(b), Seq("k")).collect()
      }
      assert(ex.getMessage.toLowerCase.contains("lgconfigk")
        || ex.getMessage.toLowerCase.contains("lgk")
        || ex.getMessage.toLowerCase.contains("different"),
        s"unexpected error: ${ex.getMessage}")
    }
  }
}
