package graft

import org.scalatest.funspec.AnyFunSpec
import graft.operators.{DailyAnalytics, Enrichment}
import graft.sources.Adapters

/** Physical-plan properties the scale design depends on — asserted, not
  * hoped for. */
class PlanSpec extends AnyFunSpec {
  import SharedSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  describe("physical plans") {
    it("dim enrichment joins broadcast — the fact side never shuffles for the join") {
      val p = plan(Enrichment.revenueByNation(spark, dir))
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("SortMergeJoin"))
    }

    it("pricing filter reaches the parquet scan (PushedFilters)") {
      val p = plan(SparkEntry.queries("q_pricing_summary")(spark, dir))
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    }

    it("the fused mart computes all window frames over ONE exchange") {
      val df = DailyAnalytics.martStockPerformance(Adapters.dailyBars(spark, dir))
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan(df)).size
      // 1 for the bars aggregation, 1 for the symbol window partitioning
      assert(exchanges == 2, s"expected 2 exchanges, plan:\n${plan(df)}")
    }

    it("projection pruning: the mart reads only the columns it needs") {
      val p = plan(DailyAnalytics.martStockPerformance(Adapters.dailyBars(spark, dir)))
      assert(p.contains("l_suppkey") && p.contains("l_extendedprice"))
      assert(!p.contains("l_comment")) // never existed, sanity
      assert(!p.contains("l_partkey")) // exists in the table, must be pruned
    }

    it("whole-stage codegen covers the scan-to-aggregate path") {
      val df = SparkEntry.queries("q_pricing_summary")(spark, dir)
      df.collect() // finalize the adaptive plan; codegen nodes appear in the executed plan
      // "*(n) " prefixes mark whole-stage-codegen stages in the plan tree
      assert(plan(df).contains("*(1) ") || plan(df).contains("*(2) "))
    }
  }
}
