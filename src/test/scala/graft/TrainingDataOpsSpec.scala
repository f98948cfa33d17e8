package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Decontamination, Packing}

/** Decontamination + packing — the corpus-preparation tail of the
  * training-data pipeline. */
class TrainingDataOpsSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("Decontamination.contaminationScores") {
    it("scores verbatim inclusion 1.0, disjoint text 0.0, partial overlap in between") {
      val evalSet = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"), // verbatim
        (2L, "completely different words about stock markets here"), // disjoint
        (3L, "the quick brown fox went somewhere else entirely today") // shares a prefix
      ).toDF("doc_id", "text")
      val scores = Decontamination.contaminationScores(corpus, "doc_id", "text", evalSet, "text")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("overlap_ratio")).toMap
      assert(scores(1L) == 1.0)
      assert(scores(2L) == 0.0)
      assert(scores(3L) > 0.0 && scores(3L) < 1.0)
    }
    it("the eval side broadcasts (no corpus-side shuffle for the match)") {
      val evalSet = Seq("a b c d").toDF("text")
      val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
      val p = Decontamination.contaminationScores(corpus, "doc_id", "text", evalSet, "text")
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"))
    }
  }

  describe("Decontamination.contaminationScoresBloom") {
    it("equals the exact scores on real documents (no false negatives, exact verify)") {
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      val corpus = docs.filter($"doc_id" % 50 =!= 0)
      val evalSet = docs.filter($"doc_id" % 50 === 0)
      val exact = Decontamination.contaminationScores(corpus, "doc_id", "text", evalSet, "text")
      val bloom = Decontamination.contaminationScoresBloom(corpus, "doc_id", "text", evalSet, "text")
      assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
    }
    it("the corpus-side prefilter is a bloom_might_contain against a literal (narrow, no relation broadcast)") {
      val evalSet = Seq("a b c d").toDF("text")
      val corpus = Seq((1L, "a b c d e f"), (2L, "x y z w v u")).toDF("doc_id", "text")
      val df = Decontamination.contaminationScoresBloom(corpus, "doc_id", "text", evalSet, "text")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"))
      // results still exact on the toy corpus
      val scores = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("overlap_ratio")).toMap
      assert(scores(1L) > 0.0 && scores(2L) == 0.0)
    }
  }

  describe("TextAnalysis.tfidfTopK") {
    it("ranks by hand-computed integer tf-idf, rare terms weighing more") {
      val docs = Seq(
        (1L, "spark spark spark common common"),  // tf(spark)=3
        (2L, "spark common common common common"), // tf(spark)=1
        (3L, "vector common common common common"), // tf(vector)=1, df(vector)=1
        (4L, "common words only nothing else here"))
        .toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis
        .tfidfTopK(docs, "doc_id", "text", Seq("spark", "vector"), k = 10)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toMap
      // N=4: w(spark)=floor(4e6/2)=2e6, w(vector)=floor(4e6/1)=4e6
      assert(out(1L) == 3L * 2000000L)
      assert(out(2L) == 1L * 2000000L)
      assert(out(3L) == 1L * 4000000L)
      assert(!out.contains(4L)) // no query terms -> never scored
      assert(out(3L) > out(2L)) // one rare term beats one common one
    }
    it("keeps ties deterministic (score desc, id asc) under limit") {
      val docs = Seq((1L, "spark a"), (2L, "spark b"), (3L, "spark c"))
        .toDF("doc_id", "text")
      val top2 = graft.operators.TextAnalysis
        .tfidfTopK(docs, "doc_id", "text", Seq("spark"), k = 2)
        .collect().map(_.getAs[Long]("doc_id")).toSeq
      assert(top2 == Seq(1L, 2L))
    }
  }

  describe("Packing.chunkSpans") {
    it("offsets tile each shard exactly: consecutive docs abut, chunks cut at the budget") {
      val docs = (1L to 40L).map(i => (i, 100 + (i % 7).toInt * 30)).toDF("doc_id", "toks")
      val spans = Packing.chunkSpans(docs, "doc_id", "toks", budget = 512, shards = 4)
        .join(docs, "doc_id")
      // per shard: start_offset of doc k = sum of tokens of earlier docs
      val bad = spans
        .withColumn("expected", sum($"toks").over(
          org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
        .filter($"start_offset" =!= coalesce($"expected", lit(0L)))
      assert(bad.isEmpty)
      // chunk ids are floor(offset/budget) and spans are consistent
      assert(spans.filter($"start_chunk" =!= floor($"start_offset" / 512)).isEmpty)
      assert(spans.filter($"end_chunk" < $"start_chunk").isEmpty)
      // some doc must cross a boundary with these sizes
      assert(spans.filter($"end_chunk" > $"start_chunk").count() > 0)
    }
    it("is deterministic: same corpus, same packs") {
      val docs = (1L to 25L).map(i => (i, 64)).toDF("doc_id", "toks")
      val a = Packing.chunkSpans(docs, "doc_id", "toks", 256, 4)
      val b = Packing.chunkSpans(docs.repartition(5), "doc_id", "toks", 256, 4)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
    it("packs completely and contiguously under ANY shard count (property)") {
      val docs = (1L to 60L).map(i => (i, 10 + (i % 11).toInt * 13)).toDF("doc_id", "toks")
      val total = 60L
      for (shards <- Seq(1, 3, 8, 64)) {
        val spans = Packing.chunkSpans(docs, "doc_id", "toks", budget = 128, shards = shards)
        // every doc placed exactly once, in its hash shard
        assert(spans.count() == total)
        assert(spans.select("doc_id").distinct().count() == total)
        // shards tile: each shard's offsets start at 0 and abut (no
        // gaps/overlaps) — Σ tokens == max(start_offset) + last tokens
        val tiled = spans.join(docs, "doc_id")
          .groupBy("shard")
          .agg(min($"start_offset").as("first"),
            max($"start_offset" + $"toks").as("endoff"),
            sum($"toks".cast("long")).as("tok_sum"))
        assert(tiled.filter($"first" =!= 0L || $"endoff" =!= $"tok_sum").isEmpty)
      }
    }
    it("auto-scales the shard count when none is pinned") {
      val docs = (1L to 30L).map(i => (i, 64)).toDF("doc_id", "toks")
      val auto = Packing.chunkSpans(docs, "doc_id", "toks", 256) // shards = auto → 64 here
      val pinned = Packing.chunkSpans(docs, "doc_id", "toks", 256, shards = 64)
      assert(auto.exceptAll(pinned).isEmpty && pinned.exceptAll(auto).isEmpty)
    }
  }

  describe("Packing.chunkWithOverlap") {
    def chunksOf(toks: Long, size: Int, overlap: Int): Seq[(Long, Long, Long)] = {
      val docs = Seq((1L, toks)).toDF("doc_id", "toks")
      Packing.chunkWithOverlap(docs, "doc_id", "toks", size, overlap)
        .orderBy("chunk_idx")
        .select("chunk_idx", "tok_start", "tok_end")
        .as[(Long, Long, Long)].collect().toSeq
    }
    it("covers every token: chunks tile the doc with exactly `overlap` shared tokens") {
      // 300 tokens, size 128, overlap 32 → starts 0, 96, 192 (clipped)
      assert(chunksOf(300, 128, 32) ==
        Seq((0L, 0L, 128L), (1L, 96L, 224L), (2L, 192L, 300L)))
    }
    it("one chunk when the doc fits, boundary cases exact") {
      assert(chunksOf(128, 128, 32) == Seq((0L, 0L, 128L)))
      assert(chunksOf(1, 128, 32) == Seq((0L, 0L, 1L)))
      // one token past the window opens exactly one more chunk
      assert(chunksOf(129, 128, 32) == Seq((0L, 0L, 128L), (1L, 96L, 129L)))
    }
    it("every chunk past the first adds at least one new token (no empty tails)") {
      for (t <- Seq(5L, 96L, 97L, 128L, 224L, 225L, 1000L)) {
        val cs = chunksOf(t, 128, 32)
        assert(cs.last._3 == t)
        assert(cs.sliding(2).forall {
          case Seq(a, b) => b._3 > a._3 && b._2 < a._3; case _ => true
        }, s"toks=$t chunks=$cs")
      }
    }
    it("rejects a degenerate overlap") {
      val docs = Seq((1L, 10L)).toDF("doc_id", "toks")
      intercept[IllegalArgumentException] {
        Packing.chunkWithOverlap(docs, "doc_id", "toks", 64, 64)
      }
    }
  }

  describe("Sampling.temperatureMixture") {
    import graft.operators.Sampling
    val docs = (1 to 900).map(i =>
      (i.toLong, if (i <= 800) "big" else if (i <= 890) "mid" else "tiny"))
      .toDF("doc_id", "source")

    it("flattens the mixture: scarce sources keep a HIGHER fraction than abundant ones") {
      val kept = Sampling.temperatureMixture(docs, "doc_id", "source",
          targetRows = 300, alpha = 0.5)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val n = Map("big" -> 800.0, "mid" -> 90.0, "tiny" -> 10.0)
      val frac = kept.map { case (s, k) => s -> k / n(s) }
      assert(frac("tiny") >= frac("mid") && frac("mid") >= frac("big"),
        s"temperature must favor scarce sources: $frac")
      // no upsampling: never more than the population
      kept.foreach { case (s, k) => assert(k <= n(s)) }
    }

    it("a target at or above the corpus keeps everything (keep-all clamps)") {
      val all = Sampling.temperatureMixture(docs, "doc_id", "source",
        targetRows = 10000, alpha = 0.5)
      assert(all.count() == 900)
    }

    it("membership is stable run to run (pure hash, no RNG)") {
      def run() = Sampling.temperatureMixture(docs, "doc_id", "source",
        targetRows = 300, alpha = 0.5).select("doc_id")
      assert(run().exceptAll(run()).isEmpty)
    }
  }

  describe("Similarity.recallAtK") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"

    it("exact-vs-itself recall is 1.0 for every query") {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter($"vec_id" % 50 === 0)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
      val r = Similarity.recallAtK(exact, exact).collect()
      assert(r.nonEmpty)
      r.foreach { row =>
        assert(row.getAs[Double]("recall") == 1.0)
        assert(row.getAs[Long]("n_hit") == row.getAs[Long]("n_exact"))
      }
    }

    it("disjoint approx result scores recall 0 with a zero hit count") {
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter($"vec_id" % 50 === 0)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
      val none = exact.withColumn("corpus_id", -col("corpus_id") - 1)
      val r = Similarity.recallAtK(exact, none).collect()
      r.foreach(row => assert(row.getAs[Double]("recall") == 0.0))
    }
  }

  describe("Profiling.thresholdSweep") {
    import graft.operators.Profiling
    it("threshold 0 keeps everything; keeps decrease monotonically; fractions bounded") {
      val docs = Seq.tabulate(50)(i => (i.toLong, "w " * (i + 1))).toDF("doc_id", "text")
      val sweep = Profiling.thresholdSweep(docs,
          length($"text").cast("long"),
          size(split($"text", " ")).cast("long"),
          Seq(0L, 10L, 40L, 1000L))
        .orderBy("threshold").collect()
      assert(sweep.length == 4)
      assert(sweep.head.getAs[Long]("docs_kept") == 50L)
      assert(sweep.head.getAs[Double]("doc_frac") == 1.0)
      val docsKept = sweep.map(_.getAs[Long]("docs_kept")).toSeq
      assert(docsKept == docsKept.sorted.reverse, s"not monotone: $docsKept")
      assert(sweep.last.getAs[Long]("docs_kept") == 0L)
      sweep.foreach { r =>
        val f = r.getAs[Double]("token_frac")
        assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  describe("Packing.paddingEfficiency") {
    it("length-sorted batching eliminates the hand case's padding waste") {
      // lengths 1,10,1,10 in id order, batches of 2:
      // arrival: {1,10},{1,10} -> padded 40, total 22, waste 0.45
      // sorted:  {1,1},{10,10} -> padded 22, waste 0
      val docs = Seq(
        (1L, "w"), (2L, ("w " * 9) + "w"), (3L, "w"), (4L, ("w " * 9) + "w"))
        .toDF("doc_id", "text").withColumn("source", lit("s"))
      val got = graft.operators.Packing
        .paddingEfficiency(docs, "doc_id", "text", "source", batchSize = 2)
        .orderBy("strategy").collect()
      assert(got(0).getAs[String]("strategy") == "arrival")
      assert(got(0).getAs[Long]("padded_tokens") == 40L)
      assert(got(0).getAs[Long]("total_tokens") == 22L)
      assert(got(0).getAs[Double]("waste_frac") == 0.45)
      assert(got(1).getAs[String]("strategy") == "length_sorted")
      assert(got(1).getAs[Long]("padded_tokens") == 22L)
      assert(got(1).getAs[Double]("waste_frac") == 0.0)
    }
  }

  describe("Profiling.fanoFactor") {
    it("constant daily counts give F=0; dispersed ones the exact ratio") {
      def ev(t: String, day: Int, n: Int) = (1 to n).map(i =>
        (t, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:0$i%01d:00")))
      // A: 2,2,2 per day -> var 0; B: 1,3 -> mean 2, var 2 -> F = 1
      val rows = (ev("a", 1, 2) ++ ev("a", 2, 2) ++ ev("a", 3, 2) ++
        ev("b", 1, 1) ++ ev("b", 2, 3)).toDF("event_type", "ts")
      val got = graft.operators.Profiling
        .fanoFactor(rows, "event_type", "ts")
        .orderBy("event_type").collect()
      assert(got(0).getAs[Double]("fano") == 0.0)
      assert(got(1).getAs[Double]("fano") == 1.0)
      assert(got(1).getAs[Double]("mean_per_day") == 2.0)
    }
  }

  describe("Profiling.lorenzCurve") {
    it("top-down cumulative shares on a hand case") {
      val df = Seq((1L, 400L), (2L, 300L), (3L, 200L), (4L, 100L))
        .toDF("k", "cents")
      val got = graft.operators.Profiling
        .lorenzCurve(df, "k", col("cents"), tiles = 2)
        .orderBy("tier").collect()
      assert(got.map(r => (r.getAs[Int]("tier"), r.getAs[Long]("tier_cents"),
        r.getAs[Double]("cum_share"))).toSeq ==
        Seq((1, 700L, 0.7), (2, 300L, 1.0)))
    }
  }

  describe("Profiling.dpGroupCounts") {
    it("thresholds are non-increasing (floor ties only at the tail) and end above zero") {
      val thr = graft.operators.Profiling.geometricThresholds(0.5)
      assert(thr.head == math.floor(math.exp(-0.5) * math.pow(2, 60)).toLong)
      assert(thr.zip(thr.tail).forall { case (a, b) => a >= b })
      // the head must decay geometrically (ties are a tail artifact)
      assert(thr.take(40).zip(thr.tail).forall { case (a, b) => a > b })
      assert(thr.last > 0L && thr.length > 50)
    }
    it("noise is keyed-PRF deterministic and bounded by the threshold count") {
      val df = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"))
        .toDF("doc_id", "lang")
      val run1 = graft.operators.Profiling.dpGroupCounts(df, "lang")
        .orderBy("lang").collect()
      val run2 = graft.operators.Profiling.dpGroupCounts(df, "lang")
        .orderBy("lang").collect()
      assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
      val k = graft.operators.Profiling.geometricThresholds(0.5).length.toLong
      run1.foreach { r =>
        assert(math.abs(r.getAs[Long]("noise")) <= k)
        assert(r.getAs[Long]("n_dp") ==
          r.getAs[Long]("n_exact") + r.getAs[Long]("noise"))
      }
    }
  }

  describe("Profiling.benfordDigits") {
    it("leading digits come from exact cents, zero/negative amounts drop") {
      // cents: 100, 1999, 10000, 2500, 350 -> digits 1,1,1,2,3
      val df = Seq(1.00, 19.99, 100.0, 25.0, 3.50, 0.0, -7.0).toDF("v")
      val got = graft.operators.Profiling
        .benfordDigits(df, col("v")).orderBy("digit").collect()
      assert(got.map(r => (r.getAs[Int]("digit"), r.getAs[Long]("n"))).toSeq ==
        Seq((1, 3L), (2, 1L), (3, 1L)))
      assert(got(0).getAs[Double]("frac") == 0.6)
      val exp1 = math.floor(math.log10(2.0) * 1e4 + 0.5) / 1e4
      assert(got(0).getAs[Double]("expected") == exp1)
    }
  }

  describe("Profiling.calibrationBins") {
    it("integer rank binning yields equal-mass bins with exact mean_p") {
      // scores 0..9, label = score >= 5, 5 bins of 2 docs each
      val df = (0 until 10).map(i => (i.toLong, i.toLong, i >= 5))
        .toDF("doc_id", "score", "label")
      val got = graft.operators.Profiling
        .calibrationBins(df, "doc_id", "score", "label", bins = 5)
        .orderBy("bin").collect()
      assert(got.length == 5)
      assert(got.forall(_.getAs[Long]("n_docs") == 2L))
      // bin 0 holds ranks 0,1 -> mean_p = 1/18; no positives
      assert(got(0).getAs[Double]("mean_p") ==
        math.floor(1.0 / 18 * 1e4 + 0.5) / 1e4)
      assert(got(0).getAs[Double]("pos_rate") == 0.0)
      // bin 2 holds ranks 4,5 -> one positive
      assert(got(2).getAs[Double]("pos_rate") == 0.5)
      // top bin fully positive: perfectly ranked classifier up top
      assert(got(4).getAs[Double]("pos_rate") == 1.0)
    }
  }

  describe("Profiling.kAnonymity / lDiversity") {
    // classes: (en,a)=3 rows, (en,b)=1, (de,a)=2; sensitive v
    lazy val rows = Seq(
      (1L, "en", "a", 10L), (2L, "en", "a", 10L), (3L, "en", "a", 20L),
      (4L, "en", "b", 30L),
      (5L, "de", "a", 40L), (6L, "de", "a", 50L))
      .toDF("id", "lang", "source", "v")

    it("k sweep counts violating classes and their rows") {
      val got = graft.operators.Profiling
        .kAnonymity(rows, Seq("lang", "source"), ks = Seq(2, 3))
        .orderBy("k").collect()
      // k=2: only (en,b) violates -> 1 class, 1 row
      assert(got(0).getAs[Long]("n_classes") == 3L)
      assert(got(0).getAs[Long]("n_violating_classes") == 1L)
      assert(got(0).getAs[Long]("n_violating_rows") == 1L)
      // k=3: (en,b) and (de,a) violate -> 2 classes, 3 rows
      assert(got(1).getAs[Long]("n_violating_classes") == 2L)
      assert(got(1).getAs[Long]("n_violating_rows") == 3L)
      assert(got(1).getAs[Double]("violating_frac") == 0.5)
    }
    it("l-diversity flags the homogeneous class") {
      // (en,a) has sensitive {10,20} l=2; (en,b) {30} l=1; (de,a) {40,50} l=2
      val got = graft.operators.Profiling
        .lDiversity(rows, Seq("lang", "source"), "v").collect().head
      assert(got.getAs[Long]("n_classes") == 3L)
      assert(got.getAs[Long]("min_diversity") == 1L)
      assert(got.getAs[Long]("n_homogeneous") == 1L)
      assert(got.getAs[Long]("n_exposed_rows") == 1L)
    }
  }

  describe("Decontamination.AhoCorasick / multiNeedleHits") {
    it("matches exactly the brute-force substring relation on generated inputs") {
      val rnd = new scala.util.Random(42)
      val alphabet = "abc" // small alphabet → dense overlaps + fail-link traffic
      def randStr(n: Int) =
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val needles = (0 until 64).map(i => randStr(1 + rnd.nextInt(5)))
      val texts = (0 until 40).map(_ => randStr(30))
      val ac = new Decontamination.AhoCorasick(needles.toArray)
      texts.foreach { t =>
        val got = ac.matchedIn(t).toSet
        val want = needles.zipWithIndex.collect {
          case (n, i) if t.contains(n) => i
        }.toSet
        assert(got == want, s"text=$t got=$got want=$want")
      }
    }

    it("reports overlapping, nested, and duplicate needles") {
      val ac = new Decontamination.AhoCorasick(Array("ab", "bab", "b", "ab"))
      // "xbab": contains "b" (2), "ab" (0 and its duplicate 3), "bab" (1)
      assert(ac.matchedIn("xbab").toSet == Set(0, 1, 2, 3))
      assert(ac.matchedIn("a").toSet == Set.empty)
    }

    it("the distributed scan equals a contains join on real documents") {
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select($"doc_id", $"text")
      val needles = docs.filter($"doc_id" % 7 === 0)
        .select($"doc_id".as("needle_id"),
          expr("substring(text, 3, 15)").as("needle"))
        .filter(length($"needle") >= 10)
      val got = Decontamination.multiNeedleHits(
        docs, "doc_id", "text", needles, "needle_id", "needle")
      val want = docs.join(needles, expr("contains(text, needle)"))
        .select($"doc_id", $"needle_id")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() > 0, "fixture produced no hits — needles too strict")
    }

    it("drops corpus rows with a NULL doc_id or NULL text (no NPE mid-scan)") {
      val corpus = Seq(
        (java.lang.Long.valueOf(1L), "alpha beta"),
        (null.asInstanceOf[java.lang.Long], "alpha beta"), // NULL id
        (java.lang.Long.valueOf(3L), null.asInstanceOf[String])) // NULL text
        .toDF("doc_id", "text")
      val needles = Seq((10L, "alpha")).toDF("needle_id", "needle")
      val got = Decontamination.multiNeedleHits(
          corpus, "doc_id", "text", needles, "needle_id", "needle")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    }
  }
}
