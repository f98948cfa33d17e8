package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Graph, Profiling, TickAnalytics}

/** Golden coverage for the round-15 wave-4 operators: rich-club
  * ladder, mutual information, exponential inter-arrival fit. */
class R15Wave4Spec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  describe("richClub") {
    it("scores the K4 core 0.6 at k=2 and NULLs the single-hub rungs") {
      // K4 on {1..4} (deg 3 each) + star center 5 -> leaves 6..15
      // (deg 10; leaves deg 1)
      val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
        (6L to 15L).map(l => (5L, l))
      val got = Graph.richClub(edges.toDF("u", "v"), "u", "v")
        .collect().map(r => r.getAs[Long]("k") -> r).toMap
      // k=2: nodes {1,2,3,4,5}, edges among them = the 6 K4 edges
      assert(got(2L).getAs[Long]("n_nodes") == 5L)
      assert(got(2L).getAs[Long]("n_edges") == 6L)
      assert(got(2L).getAs[Double]("phi") == 0.6)
      // k=4 and k=8: only the hub qualifies -> phi undefined (NULL)
      assert(got(4L).getAs[Long]("n_nodes") == 1L)
      assert(got(4L).isNullAt(got(4L).fieldIndex("phi")))
      assert(got(8L).getAs[Long]("n_nodes") == 1L)
      // k=16: nobody qualifies -> the rung STILL yields a row (the
      // ladder dimension is left-joined: fixed |ks| cardinality)
      assert(got.size == 4)
      assert(got(16L).getAs[Long]("n_nodes") == 0L)
      assert(got(16L).getAs[Long]("n_edges") == 0L)
      assert(got(16L).isNullAt(got(16L).fieldIndex("phi")))
    }
  }

  describe("mutualInfo") {
    def mi(rows: Seq[(String, String, String)]) =
      Profiling.mutualInfo(rows.toDF("g", "a", "b"), "g", "a", "b")
        .collect().head

    it("independent columns carry 0 nats; identical columns carry H with NMI 1") {
      val indep = for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
        yield ("G", a, b)
      val r0 = mi(indep)
      assert(r0.getAs[Double]("mi_nats") == 0.0, s"$r0")
      assert(r0.getAs[Double]("nmi") == 0.0, s"$r0")
      val dep = for (a <- Seq("x", "y"); _ <- 1 to 10) yield ("G", a, a)
      val r1 = mi(dep)
      val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
      assert(math.abs(r1.getAs[Double]("mi_nats") - ln2) <= 1e-6, s"$r1")
      assert(math.abs(r1.getAs[Double]("h_a") - ln2) <= 1e-6, s"$r1")
      assert(r1.getAs[Double]("nmi") == 1.0, s"$r1")
      assert(r1.getAs[Long]("n_cells") == 2L)
    }
  }

  describe("interarrivalFit") {
    it("constant gaps score D = 1 - 1/e against the MLE exponential") {
      // 41 ticks, gap exactly 1s: lambda-hat = 1/s, F(gap) = 1 - e^-1
      // for EVERY row, and the i=1 lower step edge |0 - F| is the max
      val ticks = (0 until 41).map(i => ("A", i * 1000000000L, i.toLong)) ++
        (0 until 5).map(i => ("B", i * 1000000000L, (100 + i).toLong))
      val got = TickAnalytics.interarrivalFit(
        ticks.toDF("symbol", "ts", "event_id")).collect()
      assert(got.length == 1, "symbol B has <30 gaps and must be dropped")
      val a = got.head
      assert(a.getAs[String]("symbol") == "A")
      assert(a.getAs[Long]("n_gaps") == 40L)
      assert(a.getAs[Double]("mean_gap_sec") == 1.0)
      assert(a.getAs[Double]("lambda_per_sec") == 1.0)
      val want = 1.0 - math.exp(-1.0)
      assert(math.abs(a.getAs[Double]("ks_d") - want) <= 1e-6, s"$a")
      assert(!a.getAs[Boolean]("exponential_ok")) // 0.632 >> 1.358/sqrt(40)
    }
  }
}
