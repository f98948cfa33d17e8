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

    it("AQE skew-join splits a rush-hour bucket (the documented skew story)") {
      // RangeJoin.scala's object doc claims hot buckets are ordinary
      // join skew handled by AQE's skew split, no salting — prove it:
      // one hour-bucket holds ~30x the rows of any other, thresholds
      // are scaled to the test's shuffle sizes, and the finalized
      // adaptive plan must show the SortMergeJoin running in skew
      // mode, with the result still exactly the brute-force pair set.
      val confs = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ: broadcast has no skew path
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k")
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // rush hour: 30 000 intervals inside bucket 0, ~1 000 rows in
        // each of buckets 1..99; an incompressible payload makes the
        // hot partition's shuffle bytes exceed the scaled threshold
        val hot = (0 until 30000).map { i =>
          (i.toLong, (i % 3000).toLong, (i % 3000) + 500L)
        }
        val cold = (0 until 3000).map { i =>
          val b = 1 + i % 99
          (100000L + i, b * 3600L + i % 3000, b * 3600L + i % 3000 + 400L)
        }
        val a = (hot ++ cold).toDF("a_id", "a_s", "a_e")
          .withColumn("payload", md5(concat($"a_id", lit("skewpad"))))
        val b = (0 until 100).flatMap { bkt =>
          (0 until 2).map(j => (1000000L + bkt * 2 + j,
            bkt * 3600L + j * 1800L, bkt * 3600L + j * 1800L + 1200L))
        }.toDF("b_id", "b_s", "b_e")
        // keep the payload in the output so column pruning can't strip
        // the bytes that make the hot partition heavy, and collect()
        // THIS dataset (.as/.select would wrap a new QueryExecution and
        // leave joined's adaptive plan unfinalized)
        val joined = RangeJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e")
          .select("a_id", "b_id", "payload")
        val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length === got.toSet.size, "skewed input emitted duplicates")
        val brute = a.crossJoin(b)
          .filter($"a_s" <= $"b_e" && $"b_s" <= $"a_e")
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
        assert(got.toSet === brute, "skewed input wrong pair set")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"AQE skew split did not engage on the rush-hour bucket:\n$plan")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
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
