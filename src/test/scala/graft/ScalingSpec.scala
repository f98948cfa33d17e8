package graft

import org.scalatest.funspec.AnyFunSpec
import graft.tools.Scaling

/** Growth-ratio gate: the scale-sensitive operator families, timed at
  * sf0.01 AND sf0.1, must grow sub-quadratically in their input
  * (ratio ≤ 1.5 × input growth — see Scaling's scaladoc). This is the
  * measured counterpart of the structural plan pins in PlanSpec: a
  * regression that re-introduces an all-pairs candidate stage passes
  * every correctness gate at sf0.01 and fails HERE, because its time
  * ratio jumps toward growth².
  *
  * A representative subset keeps the suite bounded (one query per
  * family, the full 18-query table lives in SCALING.md via
  * `runMain graft.tools.ScalingBench`); min-of-2 after the sf0.001
  * warm-up is enough because the gate has ≥ 2× headroom over the
  * measured ratios.
  */
class ScalingSpec extends AnyFunSpec {
  private lazy val spark = SharedSpark.spark

  private val subset = Scaling.scaleSensitive.filter { case (n, _, _) =>
    Set("q_dedup_minhash_lsh", "q_dedup_simhash", "q_sim_topk",
        "q_triangles", "q_pagerank", "q_winsorize",
        "q_dedup_recall", "q_retrieval_ndcg")(n)
  }

  describe("scale growth sf0.01 -> sf0.1") {
    it("stays sub-quadratic for every scale-sensitive family") {
      assume(new java.io.File("/root/testdata/sf0.1").isDirectory &&
             new java.io.File("/root/testdata/sf0.01").isDirectory)
      val rows = Scaling.measure(spark, subset,
        "/root/testdata/sf0.01", "/root/testdata/sf0.1", trials = 2)
      assert(rows.nonEmpty && rows.forall(r => r.tSmall > 0 && r.tLarge > 0))
      val bad = rows.filterNot(_.ok)
      assert(bad.isEmpty,
        "super-quadratic growth (ratio > 1.5x input growth): " +
          bad.map(r => f"${r.name} ratio=${r.ratio}%.1f bound=${r.bound}%.0f " +
            f"(${r.tSmall}%.2fs -> ${r.tLarge}%.2fs)").mkString("; "))
    }
  }
}
