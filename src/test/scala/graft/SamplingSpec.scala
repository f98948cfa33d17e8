package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id")

  describe("sampleByHash") {
    it("is deterministic and fraction-accurate within hash tolerance") {
      val a = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
      val b = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id").as[Long].collect().toSet
      assert(a == b)
      val n = docs.count().toDouble
      assert(math.abs(a.size / n - 0.3) < 0.1, s"got ${a.size / n}")
    }
    it("samples NEST: the 20% sample contains the 10% sample") {
      val s10 = Sampling.sampleByHash(docs, "doc_id", 0.1).as[Long].collect().toSet
      val s20 = Sampling.sampleByHash(docs, "doc_id", 0.2).as[Long].collect().toSet
      assert(s10.subsetOf(s20))
    }
    it("is partitioning-independent (the property df.sample lacks)") {
      val repart = Sampling.sampleByHash(docs.repartition(7), "doc_id", 0.3)
        .as[Long].collect().toSet
      val single = Sampling.sampleByHash(docs.coalesce(1), "doc_id", 0.3)
        .as[Long].collect().toSet
      assert(repart == single)
    }
  }

  describe("weightedByHash") {
    import graft.operators.Sampling
    it("weight 0 keeps nothing, weight >= maxWeight keeps everything, and keeps nest monotonically") {
      val none = Sampling.weightedByHash(docs, "doc_id", lit(0L), 100L)
      assert(none.isEmpty)
      val all = Sampling.weightedByHash(docs, "doc_id", lit(100L), 100L)
      assert(all.count() == docs.count())
      val w30 = Sampling.weightedByHash(docs, "doc_id", lit(30L), 100L)
      val w60 = Sampling.weightedByHash(docs, "doc_id", lit(60L), 100L)
      // higher weight strictly contains the lower-weight sample
      assert(w30.exceptAll(w60).isEmpty)
      val (n30, n60, n) = (w30.count(), w60.count(), docs.count())
      assert(n30 < n60 && n60 < n)
    }
  }

  describe("mixtureSample") {
    import graft.operators.Sampling
    it("downsamples over-represented sources, keeps scarce ones whole, drops untargeted") {
      // a: 100 rows, b: 10 rows; target 50/50 over N=110
      val d = ((1L to 100L).map(i => (i, "a")) ++ (201L to 210L).map(i => (i, "b")) ++
        Seq((900L, "c")))
        .toDF("doc_id", "source")
      val out = Sampling.mixtureSample(d, "doc_id", "source",
        Map("a" -> 0.5, "b" -> 0.5))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
      assert(!bySrc.contains("c")) // untargeted source drops
      assert(bySrc("b") == 10)     // share wants 55 of 10 -> capped, keep all
      // a: fraction 0.55 -> roughly half of 100 kept, deterministic
      val again = Sampling.mixtureSample(d, "doc_id", "source",
        Map("a" -> 0.5, "b" -> 0.5)).collect().map(r => r.getLong(0)).toSet
      assert(out.map(_._1).toSet == again)
      assert(bySrc("a") > 30 && bySrc("a") < 80)
    }
  }

  describe("capPerKeyTokens") {
    import graft.operators.Sampling
    it("admits docs in hash order until the budget is crossed, first over-budget doc included") {
      val d = Seq((1L, "s", 40L), (2L, "s", 40L), (3L, "s", 40L), (4L, "s", 40L))
        .toDF("doc_id", "source", "n_tok")
      val kept = Sampling.capPerKeyTokens(d, "source", "doc_id", "n_tok", budget = 100L)
      // hash order admits docs while cumsum-before-doc < 100: exactly 3 of 4
      assert(kept.count() == 3)
      val total = kept.agg(sum($"n_tok")).as[Long].head()
      assert(total >= 100L && total < 100L + 40L)
      // tiny budget still admits the first doc per source
      assert(Sampling.capPerKeyTokens(d, "source", "doc_id", "n_tok", 1L).count() == 1)
    }
  }

  describe("capPerKey") {
    it("keeps at most cap per key, deterministically, and caps nest") {
      val df = (1L to 100L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
      val c5 = Sampling.capPerKey(df, "source", "doc_id", 5)
      assert(c5.count() == 20)
      assert(c5.filter(col("sample_rank") > 5).isEmpty)
      val again = Sampling.capPerKey(df, "source", "doc_id", 5)
      assert(c5.exceptAll(again).isEmpty)
      // a cap above the group size keeps everything
      assert(Sampling.capPerKey(df, "source", "doc_id", 1000).count() == 100)
      // rank order is a fixed prefix: cap 5 ⊂ cap 10
      val c10 = Sampling.capPerKey(df, "source", "doc_id", 10).select("doc_id")
      assert(c5.select("doc_id").exceptAll(c10).isEmpty)
    }
  }

  describe("withSplit") {
    it("partitions every row into exactly one split with stable membership") {
      val split = Sampling.withSplit(docs, "doc_id", 0.8, 0.1)
      assert(split.filter(!$"split".isin("train", "val", "test")).isEmpty)
      assert(split.count() == docs.count())
      val again = Sampling.withSplit(docs, "doc_id", 0.8, 0.1)
      assert(split.exceptAll(again).isEmpty)
    }
    it("growing train claims docs only from val, never migrates train<->test") {
      val before = Sampling.withSplit(docs, "doc_id", 0.8, 0.1)
        .select($"doc_id", $"split".as("s1"))
      val after = Sampling.withSplit(docs, "doc_id", 0.85, 0.05)
        .select($"doc_id", $"split".as("s2"))
      val moved = before.join(after, "doc_id").filter($"s1" =!= $"s2")
      // the only legal movement under a train-fraction increase is val->train
      assert(moved.filter(!($"s1" === "val" && $"s2" === "train")).isEmpty)
      // and test membership is untouched
      assert(before.filter($"s1" === "test").count() ==
        after.filter($"s2" === "test").count())
    }
  }

  describe("stratifiedByHash") {
    it("applies per-stratum fractions; strata samples nest like the global one") {
      val docs = (1L to 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
        .toDF("doc_id", "lang")
      val small = Sampling.stratifiedByHash(docs, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.1))
      val large = Sampling.stratifiedByHash(docs, "doc_id", "lang",
        Map("en" -> 0.9, "de" -> 0.3))
      // nesting: every doc in the small sample is in the large one
      assert(small.join(large, Seq("doc_id"), "left_anti").isEmpty)
      // rough per-stratum rates (hash-uniform within ~a few percent)
      val rates = small.groupBy("lang").count().as[(String, Long)].collect().toMap
      assert(math.abs(rates("en") / 666.0 - 0.5) < 0.1)
      assert(math.abs(rates("de") / 1334.0 - 0.1) < 0.05)
      // unknown strata fall back to defaultFraction = 0 → dropped
      val none = Sampling.stratifiedByHash(docs, "doc_id", "lang", Map("fr" -> 1.0))
      assert(none.isEmpty)
    }
  }

  describe("hashBootstrapCi") {
    it("a constant outcome collapses the CI onto the mean") {
      val rows = (1 to 30).map(i => ("A", f"2024-01-$i%02d", 5.0))
        .toDF("symbol", "trade_date", "y")
      val r = Sampling.hashBootstrapCi(rows, "symbol", col("trade_date"),
        graft.functions.Funcs.scaled(col("y"), 4)).collect().head
      assert(r.getAs[Double]("mean") == 5.0)
      assert(r.getAs[Double]("ci_lo") == 5.0)
      assert(r.getAs[Double]("ci_hi") == 5.0)
      assert(r.getAs[Long]("n_units") == 30L)
    }
    it("is replayable: two runs produce identical CIs and the CI brackets the mean") {
      val rows = (1 to 40).map(i => ("A", f"2024-01-$i%02d", (i % 7).toDouble))
        .toDF("symbol", "trade_date", "y")
      def run() = Sampling.hashBootstrapCi(rows, "symbol", col("trade_date"),
        graft.functions.Funcs.scaled(col("y"), 4)).collect().head
      val (a, b) = (run(), run())
      assert(a == b)
      assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("mean") &&
        a.getAs[Double]("mean") <= a.getAs[Double]("ci_hi"))
    }
  }
}
