package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Graph, TextAnalysis, Versioning}

/** Triangle counting, LM count tables, vocab coverage, snapshot diff —
  * the round-8 additions. */
class GraphVersioningSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("Graph.triangleCounts") {
    it("counts the known triangles of a hand-built graph") {
      // 1-2-3 triangle; 3-4-5 triangle; 5-6 pendant edge; so
      // vertex 3 is in both, 5 in one, 6 in none
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L), (5L, 6L))
        .toDF("u", "v")
      val got = Graph.triangleCounts(edges, "u", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    }
    it("is insensitive to edge direction and parallel duplicates") {
      val a = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
      val b = Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (1L, 2L)).toDF("u", "v")
      val ca = Graph.triangleCounts(a, "u", "v").orderBy("id").collect().toSeq
      val cb = Graph.triangleCounts(b, "u", "v").orderBy("id").collect().toSeq
      assert(ca == cb)
    }
    it("counts each K4 vertex in 3 triangles (complete-graph closure)") {
      val k4 = (for { i <- 1 to 4; j <- 1 to 4 if i < j } yield (i.toLong, j.toLong))
        .toDF("u", "v")
      val got = Graph.triangleCounts(k4, "u", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    }
  }

  describe("TextAnalysis.ngramLmCounts") {
    it("matches hand-computed unigram/successor/predecessor counts") {
      val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
      // bigrams: (a b)×2, (b a)×1, (b c)×1
      val got = TextAnalysis.ngramLmCounts(docs, "doc_id", "text")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got("a") == ((2L, 1L, 1L))) // 2 occurrences; a->b; b->a
      assert(got("b") == ((3L, 2L, 1L))) // b->{a,c}; a->b
      assert(got("c") == ((1L, 0L, 1L))) // sentence-final; b->c
    }
    it("scales continuation probability by the bigram type count") {
      val docs = Seq((1L, "x y"), (2L, "z y")).toDF("doc_id", "text")
      // types: (x y), (z y) => 2; y's n_pred = 2 => 10^6 * 2/2
      val y = TextAnalysis.ngramLmCounts(docs, "doc_id", "text")
        .filter($"token" === "y").collect().head
      assert(y.getAs[Long]("kn_cont_scaled") == 1000000L)
    }
  }

  describe("TextAnalysis.vocabCoverage") {
    it("computes the OOV fraction against the top-k head") {
      val docs = Seq(
        (1L, "a a a b"), (2L, "a b rare"), (3L, "a b b x")).toDF("doc_id", "text")
      // doc freq: a=3, b=3, rare=1, x=1 -> top-2 vocab = {a, b}
      val got = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabK = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got(1L) == ((4L, 4L, 0L)))
      assert(got(2L) == ((3L, 2L, 3333L))) // floor(1e4 * 1/3)
      assert(got(3L) == ((4L, 3L, 2500L)))
    }
  }

  describe("Versioning.snapshotDiff") {
    it("labels added/removed/changed/unchanged correctly") {
      val old = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L)).toDF("k", "s", "n")
      val neu = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "w", 40L)).toDF("k", "s", "n")
      val got = Versioning.snapshotDiff(old, neu, Seq("k"), Seq("s", "n"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    }
    it("keeps the compare narrow: only key + one hash column travel into the join") {
      val old = Seq((1L, "x", 10L)).toDF("k", "s", "n")
      val neu = Seq((1L, "x", 10L)).toDF("k", "s", "n")
      val plan = Versioning.snapshotDiff(old, neu, Seq("k"), Seq("s", "n"))
        .queryExecution.executedPlan.toString
      // the wide columns s/n must not appear in the join output
      assert(plan.contains("__h_old") && plan.contains("__h_new"))
      assert(plan.contains("FullOuter") || plan.contains("full_outer"))
    }
  }

  describe("Graph.labelPropagation") {
    it("a clique converges to its min label; a lone pair oscillates to singletons") {
      import spark.implicits._
      val clique = for (a <- Seq(0L, 2L, 4L, 6L); b <- Seq(0L, 2L, 4L, 6L) if a < b)
        yield (a, b)
      val edges = (clique :+ (10L, 12L)).toDF("u", "v")
      val got = graft.operators.Graph.labelPropagation(edges, "u", "v", iters = 2)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      // after 2 synchronous rounds the 4-clique is all label 0
      Seq(0L, 2L, 4L, 6L).foreach(id => assert(got(id) == 0L, s"id $id -> ${got(id)}"))
      // the isolated pair swaps labels each round (known LPA
      // oscillation): after an even round each keeps its own
      assert(got(10L) == 10L && got(12L) == 12L)
    }
    it("label 0 survives the packed-key argmax (no modulo wraparound)") {
      import spark.implicits._
      val edges = Seq((0L, 2L), (0L, 4L), (2L, 4L)).toDF("u", "v")
      val got = graft.operators.Graph.labelPropagation(edges, "u", "v", iters = 2)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
      assert(got.values.toSet == Set(0L), s"got $got")
    }
  }

  describe("Graph.kCore") {
    // K4 on {1,2,3,4} plus a pendant path 4—5—6: the 2-core must peel
    // 6 first and then 5 (a CASCADE — 5 only drops below degree 2
    // after 6 goes), keeping exactly the K4
    it("peels a pendant path by cascade, keeping the K4 as the 2-core") {
      import spark.implicits._
      val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
        (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
      val got = graft.operators.Graph.kCore(edges, "u", "v", k = 2, rounds = 4)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("degree")).toMap
      assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
    }
    it("k above the max degree empties the graph") {
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
      assert(graft.operators.Graph.kCore(edges, "u", "v", k = 3, rounds = 2).isEmpty)
    }
    it("a clique is its own k-core for every k below its degree") {
      import spark.implicits._
      val n = 5
      val edges = (for (i <- 1 to n; j <- i + 1 to n) yield (i.toLong, j.toLong))
        .toDF("u", "v")
      val got = graft.operators.Graph.kCore(edges, "u", "v", k = n - 1, rounds = 3)
        .collect().map(_.getAs[Long]("degree")).toSeq
      assert(got.length == n && got.forall(_ == n - 1))
    }
  }

  describe("Graph.hits") {
    it("a directed star concentrates all authority on the center") {
      // 1→10, 2→10, 3→10: node 10 is the ONLY authority (share 1),
      // the three spokes are equal hubs (share 1/3 each)
      val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("a", "b")
      val got = Graph.hits(edges, "a", "b", iters = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Double]("hub_share"), r.getAs[Double]("auth_share"))).toMap
      assert(got(10L)._2 == 1.0 && got(10L)._1 == 0.0)
      Seq(1L, 2L, 3L).foreach { id =>
        assert(got(id)._2 == 0.0 && got(id)._1 == 0.333333)
      }
    }
    it("shares sum to ~1 on an asymmetric graph and dedup parallel edges") {
      val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
        .toDF("a", "b")
      val rows = Graph.hits(edges, "a", "b", iters = 2).collect()
      val hubSum = rows.map(_.getAs[Double]("hub_share")).sum
      val authSum = rows.map(_.getAs[Double]("auth_share")).sum
      assert(math.abs(hubSum - 1.0) < 1e-4 && math.abs(authSum - 1.0) < 1e-4)
    }
  }

  describe("Graph.adamicAdar") {
    it("predicts the two ends of a path, weighted by the bridge degree") {
      // path 1—2—3: the only non-adjacent pair with a common
      // neighbor is (1,3) via node 2 (deg 2) → floor(1e6/ln 2)
      val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
      val got = Graph.adamicAdar(edges, "u", "v", cap = 64).collect()
      assert(got.length == 1)
      val r = got.head
      assert(r.getAs[Long]("u") == 1L && r.getAs[Long]("v") == 3L)
      assert(r.getAs[Long]("score") == (1e6 / math.log(2.0)).toLong)
      assert(r.getAs[Long]("n_common") == 1L)
    }
    it("excludes already-adjacent pairs and over-cap apexes") {
      // triangle 1-2-3 (all adjacent → no predictions) plus a hub 9
      // over the cap connecting 4 and 5: with cap=3 the hub (deg 2)
      // still counts; with cap=1 nothing does
      val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (9L, 4L), (9L, 5L)).toDF("u", "v")
      val got = Graph.adamicAdar(tri, "u", "v", cap = 3)
        .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
      assert(got == Set((4L, 5L)))
    }
  }

  describe("Graph.assortativity") {
    it("a star is perfectly disassortative; a balanced cycle is undefined") {
      val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
      val r = Graph.assortativity(star, "u", "v").collect().head
      assert(r.getAs[Long]("n_edge_ends") == 8L)
      assert(r.getAs[Double]("assortativity") == -1.0)

      // every node degree 2 => zero variance => NULL, not a crash
      val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("u", "v")
      val c = Graph.assortativity(cycle, "u", "v").collect().head
      assert(c.isNullAt(c.fieldIndex("assortativity")))
    }
  }

  describe("Graph.clusteringCoefficient") {
    it("scores a triangle 1.0, its bridge node by its degree, a pendant NULL") {
      // triangle {1,2,3} + pendant edge 3-4
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("u", "v")
      val got = Graph.clusteringCoefficient(edges, "u", "v")
        .collect().map(r => r.getAs[Long]("id") -> r).toMap
      assert(got(1L).getAs[Double]("clustering_coef") == 1.0)
      assert(got(2L).getAs[Double]("clustering_coef") == 1.0)
      // node 3: degree 3, 1 triangle → 2/(3·2) = 0.3333
      assert(got(3L).getAs[Long]("degree") == 3)
      assert(got(3L).getAs[Double]("clustering_coef") == 0.3333)
      // degree-1 node: coefficient undefined → NULL, row kept
      assert(got(4L).isNullAt(got(4L).fieldIndex("clustering_coef")))
      assert(got(4L).getAs[Long]("triangles") == 0L)
    }

    it("a K4 scores 1.0 everywhere") {
      val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("u", "v")
      val got = Graph.clusteringCoefficient(k4, "u", "v").collect()
      assert(got.length == 4)
      got.foreach(r => assert(r.getAs[Double]("clustering_coef") == 1.0))
    }
  }

  describe("Graph.personalizedPageRank") {
    it("seeding every node recovers plain PageRank exactly") {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      val edges = (pairs ++ pairs.map(_.swap)).toDF("u", "v")
      val all = Seq(1L, 2L, 3L, 4L).toDF("id")
      val ppr = Graph.personalizedPageRank(edges, "u", "v", all, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val pr = Graph.pageRankScaled(edges, "u", "v", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ppr == pr)
    }

    it("restart mass concentrates around the seed; off-graph seeds are ignored") {
      // path 1-2-3-4 (both directions), seed {1, 99 (off-graph)}
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      val edges = (pairs ++ pairs.map(_.swap)).toDF("u", "v")
      val got = Graph.personalizedPageRank(edges, "u", "v",
          Seq(1L, 99L).toDF("id"), iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!got.contains(99L))
      // exact integer fixpoint, hand-unrolled (note the length-2 walk
      // parity: mass at distance 2 exceeds distance 1 after 2 iters —
      // the correct random-walk behavior on a path, NOT monotone decay):
      //   r1 = {1: 150e9 (restart), 2: 850e9, 3: 0, 4: 0}
      //   r2 = {1: 150e9 + 17·425e9/20, 2: 17·150e9/20, 3: 17·425e9/20, 4: 0}
      assert(got == Map(1L -> 511250000000L, 2L -> 127500000000L,
        3L -> 361250000000L, 4L -> 0L))
    }
  }

  describe("TextAnalysis.pmiCollocations") {
    it("matches the hand-computed PMI of a templated corpus") {
      // 10 docs of "alpha beta gamma": bigrams (alpha,beta) and
      // (beta,gamma) 10x each; N_bi=20, N_uni=30, each unigram 10
      // pmi = ln(10/20) − ln(10/30) − ln(10/30) = ln 4.5 = 1.5040…
      val docs = (0 until 10).map(i => (i.toLong, "alpha beta gamma"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
        minCount = 5L, k = 10).orderBy("rank").collect()
      assert(got.length == 2)
      assert(got(0).getAs[String]("w1") == "alpha") // tie → lexicographic w1
      assert(got(1).getAs[String]("w1") == "beta")
      got.foreach { r =>
        assert(r.getAs[Long]("n_pair") == 10L)
        assert(math.abs(r.getAs[Double]("pmi") - math.log(4.5)) < 0.001)
      }
    }

    it("minCount suppresses rare pairs") {
      val docs = ((0 until 6).map(i => (i.toLong, "x y")) :+ (9L, "rare pair"))
        .toDF("doc_id", "text")
      val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text",
        minCount = 5L, k = 10).collect()
      assert(got.map(_.getAs[String]("w1")).toSet == Set("x"))
    }
  }
}
