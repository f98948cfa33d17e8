package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.functions.Funcs
import graft.sources.Tables

/** The two exact money paths must agree: DECIMAL(38) typed aggregation
  * (warehouse-edge surface) and scaled-long aggregation (internal
  * shuffle-cheap representation). */
class MoneySpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("Funcs.money") {
    it("DECIMAL(38) sums equal the scaled-long path exactly on real money data") {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val both = li.groupBy("l_returnflag").agg(
        sum(Funcs.money($"l_extendedprice", 2)).as("dec_sum"),
        (sum(Funcs.scaled($"l_extendedprice", 2)) / 100.0).as("long_sum"))
      val mismatch = both.filter($"dec_sum".cast("double") =!= $"long_sum")
      assert(mismatch.isEmpty)
      // and the declared type really is the warehouse edge type
      assert(both.schema("dec_sum").dataType.sql.startsWith("DECIMAL(38,"))
    }
    it("keeps exactness past the scaled-long range bound (the reason the edge type exists)") {
      // scaled(x, 4) is exact only while x*10^4 fits a long (~9.2e14);
      // DECIMAL(38,4) carries 34 integer digits
      val df = Seq(0.1, 0.2, 0.3, 1e15, -1e15).toDF("v")
      val r = df.agg(
        sum(Funcs.money($"v", 4)).as("dec"),
        (sum(Funcs.scaled($"v", 4)) / 1e4).as("lng")).head()
      assert(r.getDecimal(0).doubleValue() == 0.6)   // DECIMAL exact at any magnitude
      assert(r.getDouble(1) != 0.6)                  // long path is out of contract here
    }
  }
}
