package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  *
  * Registers the custom native expressions: [[RollingHash]],
  * [[MinHashSig]], [[SimHashSig]], [[WordShingles]], [[HyperplaneSig]],
  * [[DotQ]], [[QuantizeVec]], [[NearestCells]], [[CmsMergeAgg]],
  * [[CmsEstimate]], plus Spark's own bloom aggregate/probe exposed as
  * functions. The reference's own operator
  * surface needs no custom Catalyst rules/strategies (SURVEY §4
  * conclusion) — this hook exists for the scale-path primitives that
  * built-ins can't express without interpreted lambdas or blown-up
  * row counts, plus ONE planner strategy: [[PinPartitioningStrategy]],
  * which restores the hash-layout fact that `localCheckpoint` drops
  * under AQE so iterative graph loops stop re-exchanging their label
  * frames every round.
  *
  * Builders validate like Spark's own registry entries: wrong arity
  * and non-literal config arguments raise an `AnalysisException` with
  * the standard error class (`WRONG_NUM_ARGS` / `NON_FOLDABLE_ARGUMENT`)
  * instead of an opaque eval-time NPE, and surplus arguments are
  * rejected rather than silently dropped.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Planner strategy for the one custom logical node: the staging
    // layer's partitioning pin (see PinHashPartitioning's soundness
    // contract — only Staging.snapshotKeyed constructs it).
    ext.injectPlannerStrategy(_ => new PinPartitioningStrategy)
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(
        arity("rolling_hash", children, 1, 1).head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(
        arity("minhash_sig", children, 1, 2).head,
        foldableInt("minhash_sig", "numHashes", children, 1, default = 32))))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (children: Seq[Expression]) => SimHashSig(
        arity("simhash_sig", children, 1, 2).head,
        foldableInt("simhash_sig", "bits", children, 1, default = 60))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(
        arity("word_shingles", children, 1, 2).head,
        foldableInt("word_shingles", "n", children, 1, default = 3))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => HyperplaneSig(
        arity("hyperplane_sig", children, 1, 2).head,
        foldableInt("hyperplane_sig", "planes", children, 1, default = 12))))
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (children: Seq[Expression]) => {
        val c = arity("dot_q", children, 2, 2)
        DotQ(c.head, c(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "quantize_vec"),
      (children: Seq[Expression]) => {
        val c = arity("quantize_vec", children, 2, 2)
        QuantizeVec(c.head, c(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (children: Seq[Expression]) => {
        val c = arity("nearest_cells", children, 2, 3)
        NearestCells(c.head, c(1),
          foldableInt("nearest_cells", "nProbe", children, 2, default = 1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        val c = arity("pq_encode", children, 3, 3)
        PqEncode(c.head, c(1), c(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("adc_dist"),
      new ExpressionInfo(classOf[AdcDist].getName, "adc_dist"),
      (children: Seq[Expression]) => {
        val c = arity("adc_dist", children, 2, 2)
        AdcDist(c.head, c(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => WinnowFps(
        arity("winnow_fps", children, 1, 3).head,
        foldableInt("winnow_fps", "k", children, 1, default = 4),
        foldableInt("winnow_fps", "w", children, 2, default = 4))))
    // Spark's own bloom-filter expressions, which core registers only
    // for the optimizer's injected runtime filters — exposing them as
    // functions gives pipelines an explicit "build once, prefilter a
    // huge scan" primitive (see Decontamination.contaminationScoresBloom).
    // bloom_filter_agg(longCol[, estimatedItems[, numBits]]) → binary
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => {
        val c = arity("bloom_filter_agg", children, 1, 3)
        c.size match {
          case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head)
          case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head, c(1))
          case _ => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c.head, c(1), c(2))
        }
      }))
    // bloom_might_contain(binary, longCol) → boolean (no false negatives)
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        val c = arity("bloom_might_contain", children, 2, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c.head, c(1))
      }))
    // cms_merge_agg(binary) → binary: in-plan Count-Min sketch rollup
    // (Spark ships the build aggregate but no merge — same gap as bloom)
    ext.injectFunction((
      FunctionIdentifier("cms_merge_agg"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge_agg"),
      (children: Seq[Expression]) => CmsMergeAgg(
        arity("cms_merge_agg", children, 1, 1).head)))
    // cms_estimate(binary, string) → bigint: in-plan point-frequency read
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => {
        val c = arity("cms_estimate", children, 2, 2)
        CmsEstimate(c.head, c(1))
      }))
  }
}

object GraftExtensions {
  /** Reject wrong argument counts at resolution time with Spark's
    * standard error class (extra args would otherwise be silently
    * ignored by positional `lift`). */
  private def arity(fn: String, children: Seq[Expression],
                    min: Int, max: Int): Seq[Expression] = {
    if (children.size < min || children.size > max)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> (if (min == max) min.toString else s"[$min, $max]"),
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    children
  }

  /** Optional literal-int config argument: absent → default; present
    * but non-foldable (a column, a non-deterministic call) → a clear
    * `NON_FOLDABLE_ARGUMENT` instead of an NPE from `eval()` on an
    * unbound attribute. */
  private def foldableInt(fn: String, param: String, children: Seq[Expression],
                          idx: Int, default: Int): Int =
    children.lift(idx) match {
      case None => default
      case Some(e) =>
        if (!e.foldable)
          throw new AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> s"`$fn`",
              "paramName" -> s"`$param`",
              "paramType" -> "\"INT\""))
        e.eval() match {
          case n: Number => n.intValue
          case _ => throw new AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> s"`$fn`",
              "paramName" -> s"`$param`",
              "paramType" -> "\"INT\""))
        }
    }
}
