package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random intervals: start from a hash mix,
    * length from another, so the set has touching, nested, disjoint,
    * and bucket-straddling cases without RNG. */
  private def intervals(n: Int, salt: Int, span: Long, maxLen: Long) =
    (0 until n).map { i =>
      val s = math.abs((i * 2654435761L + salt) % span)
      val len = math.abs((i * 40503L + salt * 7) % maxLen)
      (i.toLong, s, s + len)
    }

  describe("RangeJoin.overlapJoin") {
    it("matches the brute-force overlap join exactly, across bucket sizes") {
      val a = intervals(120, 1, 100000L, 9000L).toDF("a_id", "a_s", "a_e")
      val b = intervals(90, 42, 100000L, 2500L).toDF("b_id", "b_s", "b_e")
      val brute = a.crossJoin(b)
        .filter($"a_s" <= $"b_e" && $"b_s" <= $"a_e")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(brute.nonEmpty)
      for (bucket <- Seq(1L, 97L, 3600L, 100000L)) {
        val got = RangeJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", bucket)
          .select("a_id", "b_id").as[(Long, Long)].collect().toList
        assert(got.size === got.toSet.size, s"bucket=$bucket emitted duplicates")
        assert(got.toSet === brute, s"bucket=$bucket wrong pair set")
      }
    }

    it("touching endpoints count as overlap; adjacent-but-disjoint do not") {
      val a = Seq((1L, 100L, 200L)).toDF("a_id", "a_s", "a_e")
      val b = Seq((10L, 200L, 300L), (11L, 201L, 300L), (12L, 0L, 99L))
        .toDF("b_id", "b_s", "b_e")
      val got = RangeJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 50L)
        .select("b_id").as[Long].collect().toSet
      assert(got === Set(10L))
    }

    it("plans as an equi join on the bucket, not a nested loop") {
      val a = intervals(10, 3, 1000L, 100L).toDF("a_id", "a_s", "a_e")
      val b = intervals(10, 9, 1000L, 100L).toDF("b_id", "b_s", "b_e")
      val plan = RangeJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 60L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
    }
  }
}
