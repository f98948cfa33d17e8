package graft

import java.time.Duration

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.quality.Freshness
import graft.quality.Freshness._

class FreshnessSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val now = lit("2024-01-10 12:00:00").cast("timestamp")

  private def src(loadedAt: String*) =
    loadedAt.toSeq.toDF("loaded_at")
      .withColumn("loaded_at", to_timestamp($"loaded_at"))

  private val (warnAfter, errorAfter) = (Duration.ofHours(25), Duration.ofHours(49))

  describe("check") {
    it("classifies a recent load as fresh") {
      val r = check(src("2024-01-10 11:00:00"), "loaded_at", now, warnAfter, errorAfter)
      assert(r.status == Fresh && r.ageSeconds.contains(3600L))
    }
    it("warns past warn_after but under error_after (uses the NEWEST row)") {
      val r = check(src("2024-01-08 12:00:00", "2024-01-09 10:00:00"),
        "loaded_at", now, warnAfter, errorAfter)
      assert(r.status == Stale)
      assert(r.maxLoadedAt.get.toString.startsWith("2024-01-09 10:00:00"))
    }
    it("errors past error_after") {
      val r = check(src("2024-01-01 00:00:00"), "loaded_at", now, warnAfter, errorAfter)
      assert(r.status == Expired)
    }
    it("reports NoData on an empty source") {
      val r = check(src().filter(lit(false)), "loaded_at", now, warnAfter, errorAfter)
      assert(r.status == NoData)
    }
  }

  describe("enforce") {
    it("throws on an expired source with the threshold in the message") {
      val e = intercept[IllegalStateException] {
        enforce(src("2024-01-01 00:00:00"), "loaded_at", now, warnAfter, errorAfter, "batch")
      }
      assert(e.getMessage.contains("batch") && e.getMessage.contains("error_after"))
    }
    it("throws on an empty source") {
      intercept[IllegalStateException] {
        enforce(src().filter(lit(false)), "loaded_at", now, warnAfter, errorAfter)
      }
    }
    it("passes fresh and stale sources, returning the result") {
      assert(enforce(src("2024-01-10 11:00:00"), "loaded_at", now, warnAfter, errorAfter).status == Fresh)
      assert(enforce(src("2024-01-09 10:00:00"), "loaded_at", now, warnAfter, errorAfter).status == Stale)
    }
    it("stream thresholds mirror sources.yml: 2h warn / 6h error") {
      val (w, e) = Freshness.streamThresholds
      assert(enforce(src("2024-01-10 09:00:00"), "loaded_at", now, w, e).status == Stale)
      intercept[IllegalStateException] {
        enforce(src("2024-01-10 05:00:00"), "loaded_at", now, w, e)
      }
    }
  }
}
