package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec
import graft.functions.Funcs

/** Numeric-determinism layer: the engine-portable rounding/hashing
  * primitives everything else leans on. (Property inputs are drawn
  * with ScalaCheck generators and asserted in-loop — the scalatest
  * bridge artifact isn't on the offline classpath.) */
class FuncsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def evalD(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("r")).as[Double].head()

  describe("rd (floor-based rounding)") {
    it("rounds exact positive halves up") {
      assert(evalD(Funcs.rd(lit(2.5), 0)) == 3.0)
      assert(evalD(Funcs.rd(lit(1.25), 1)) == 1.3)
    }
    it("agrees with floor-scaling on a random sample (one batch plan)") {
      val xs = sample(Gen.chooseNum(-1e6, 1e6), 200)
      val got = xs.toDF("x").select(Funcs.rd($"x", 2).as("r")).as[Double].collect()
      xs.zip(got).foreach { case (x, r) =>
        assert(r == math.floor(x * 100 + 0.5) / 100, s"x=$x")
      }
    }
  }

  describe("scaled / scaledAvg") {
    it("recovers exact fixed-point integers from fixed-decimal doubles") {
      val xs = sample(Gen.chooseNum(0, 4000000), 200).map(_ / 100.0) // 2-decimal grid
      val got = xs.toDF("x").select(Funcs.scaled($"x", 2).as("s")).as[Long].collect()
      xs.zip(got).foreach { case (x, s) =>
        assert(s == math.round(x * 100), s"x=$x")
      }
    }
  }

  describe("hash60") {
    it("matches the reference md5 construction (JVM-computed)") {
      val got = Seq("5|abc").toDF("s").select(Funcs.hash60($"s").as("h")).as[Long].head()
      val mdig = java.security.MessageDigest.getInstance("MD5")
      val hex = mdig.digest("5|abc".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      assert(got == java.lang.Long.parseLong(hex, 16))
      assert(got == 504200961213222786L) // cross-checked against DuckDB
    }
    it("is non-negative (60 bits) on arbitrary strings") {
      val xs = sample(Gen.asciiPrintableStr, 100)
      val got = xs.toDF("s").select(Funcs.hash60($"s").as("h")).as[Long].collect()
      assert(got.forall(_ >= 0L))
    }
  }

  describe("wordShingles") {
    it("produces ordered distinct n-grams; short texts yield empty") {
      val out = Seq("a b c d", "a b").toDF("t")
        .select(Funcs.wordShingles($"t", 3).as("sh")).as[Seq[String]].collect()
      assert(out(0) == Seq("a b c", "b c d"))
      assert(out(1).isEmpty)
    }
  }

  describe("safeDivide") {
    it("guards zero and null denominators") {
      val r = Seq((10.0, 0.0), (10.0, 2.0)).toDF("n", "d")
        .select(Funcs.safeDivide($"n", $"d", lit(-1.0)).as("r")).as[Double].collect()
      assert(r.toSeq == Seq(-1.0, 5.0))
    }
  }
}
