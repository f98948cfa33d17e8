package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{AsOfJoin, Skew}
import graft.functions.Funcs

class AsOfJoinSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("asOfBackward") {
    it("attaches the latest right row at or before each left time") {
      val trades = Seq(("A", 5, "t1"), ("A", 10, "t2"), ("A", 2, "t3"), ("B", 7, "t4"))
        .toDF("sym", "t", "trade")
      val quotes = Seq(("A", 1, 100.0), ("A", 5, 105.0), ("A", 8, 108.0), ("B", 9, 200.0))
        .toDF("sym", "qt", "px")
      val out = AsOfJoin.asOfBackward(trades, quotes, Seq("sym"), "t", "qt")
        .select("trade", "px").as[(String, Option[Double])].collect().toMap
      assert(out("t1").contains(105.0)) // boundary: quote at t=5 included
      assert(out("t2").contains(108.0))
      assert(out("t3").contains(100.0))
      assert(out("t4").isEmpty)         // no B quote at/before t=7
    }

    it("a NULL field in the matched right row stays NULL (no stale resurrection)") {
      val trades = Seq(("A", 3, "t1")).toDF("sym", "t", "trade")
      val quotes = Seq(("A", 1, Some(100.0), Some(10.0)), ("A", 2, None, Some(20.0)))
        .toDF("sym", "qt", "px", "sz")
      val row = AsOfJoin.asOfBackward(trades, quotes, Seq("sym"), "t", "qt")
        .select("px", "sz").as[(Option[Double], Option[Double])].head()
      // latest right row is (t=2, px=NULL, sz=20): px must be NULL, not 100
      assert(row == (None, Some(20.0)))
    }
  }

  describe("Skew.saltedSum") {
    it("equals the plain grouped sum/count") {
      val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i.toLong))
        .toDF("k", "v")
      val salted = Skew.saltedSum(df, Seq("k"), col("v"), buckets = 8)
      val plain = df.groupBy("k")
        .agg(sum("v").as("sum_value"), count(lit(1)).as("count_rows"))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }
}
