package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.plans.RollingHash

/** The custom codegen'd expression: interpreted eval == codegen eval ==
  * a JVM-side reference fold. */
class RollingHashSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def refHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)

  describe("rolling_hash") {
    it("matches the reference fold (codegen path, many rows)") {
      val in = Seq("", "a", "hi", "the quick brown fox", "ünïcödé ok", "x" * 1000)
      val got = in.toDF("s")
        .select(call_function("rolling_hash", $"s").as("h")).as[Long].collect()
      assert(got.toSeq == in.map(refHash))
    }
    it("matches in the interpreted path too") {
      val e = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("hi"))
      assert(e.eval(null) == refHash("hi")) // (0*31+104)*31+105 = 103129... mod
      assert(refHash("hi") == (104L * 31 + 105) % 1000000007L)
    }
    it("is null-safe") {
      val got = Seq(Option.empty[String], Some("a")).toDF("s")
        .select(call_function("rolling_hash", $"s").as("h")).as[Option[Long]].collect()
      assert(got(0).isEmpty && got(1).contains(refHash("a")))
    }
  }

  describe("extension function builders") {
    it("reject surplus arguments with WRONG_NUM_ARGS instead of ignoring them") {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        Seq("a b c").toDF("s")
          .select(expr("minhash_sig(array('a'), 32, 99)")).collect()
      }
      assert(ex.getMessage.contains("minhash_sig") && ex.getMessage.contains("parameters"))
    }
    it("reject a non-literal config argument with NON_FOLDABLE_ARGUMENT, not an NPE") {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        Seq(("a b c", 4)).toDF("s", "n")
          .select(expr("word_shingles(s, n)")).collect()
      }
      assert(ex.getMessage.contains("word_shingles") && ex.getMessage.contains("foldable"))
    }
  }
}
