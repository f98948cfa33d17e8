package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable approximate-distinct sketches (Apache DataSketches HLL,
  * exposed by Spark as `hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`).
  *
  * The 100 TB pattern these enable: compute one SKETCH per fine grain
  * (day × source, say) in the single pass that touches the raw data,
  * persist the sketch bytes next to the rollup, and answer every
  * coarser distinct-count question (per source, per month, global) by
  * UNIONING sketches — kilobytes per group — without ever rescanning
  * the corpus. Exact distinct at those grains would need a re-shuffle
  * of raw keys per question asked; `countDistinct` does not
  * partial-aggregate across grains, sketches do.
  *
  * Estimates are approximate (±~1.6% per-sketch rsd at lgK=12 —
  * DataSketches' published HLL error bounds), so these queries carry
  * NO DuckDB oracle: the driver records the weaker rows-only check and
  * the ScalaTest suite asserts the accuracy contract against exact
  * counts plus the merge law (union-of-parts ≈ sketch-of-whole).
  */
object Sketches {

  /** One HLL sketch + its estimate per group: the fine-grain pass.
    * Output: groupCols*, n_rows, sketch (binary), approx_distinct. */
  def distinctSketchByGroup(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("approx_distinct", hll_sketch_estimate(col("sketch")))

  /** One Count-Min frequency sketch per group — the mergeable
    * POINT-FREQUENCY companion to the HLL distinct sketches: CMS
    * answers "how often does key x appear" (over-estimate bounded by
    * ε·N with probability 1−δ), HLL answers "how many distinct keys".
    * Same 100 TB pattern: sketch at the fine grain in the one pass
    * that touches raw data, merge upward in kilobytes. CMS is LINEAR
    * (cells are counts), so merged-sketch estimates equal
    * whole-data-sketch estimates exactly — asserted in SketchesSpec,
    * not just cited.
    *
    * Output: groupCols*, n_rows, cms (binary, Spark's
    * `count_min_sketch` format — fixed seed so sketches are mergeable
    * and byte-deterministic). */
  def cmsByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 eps: Double = 0.001, confidence: Double = 0.99,
                 seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
          .as("cms"))

  /** Query a collected CMS binary for candidate string keys — the
    * driver-side "model read" (sketches are the model: kilobytes,
    * bounded by ε/δ, never by data). */
  def cmsEstimate(cmsBytes: Array[Byte], key: String): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(cmsBytes))
      .estimateCount(key)

  /** Merge CMS binaries (same eps/confidence/seed) into one. */
  def cmsMerge(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "cmsMerge: need at least one sketch")
    val merged = sketches.map(b =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }

  /** One KLL quantile sketch per group (DataSketches KLL via Spark's
    * `kll_sketch_agg_double`) — the mergeable QUANTILE companion to
    * the HLL/CMS sketches: KLL answers "what is the p99 of x" with a
    * published rank-error bound (~1.65% at k=200), in kilobytes,
    * mergeable upward without rescanning raw data. Exact grouped
    * percentiles ([[graft.SparkEntry]] q_quantiles) buffer per-group
    * value multisets; at 100 TB the sketch IS the only way to keep
    * every (day × source) percentile query out of the raw data.
    *
    * Output: groupCols*, n_rows, kll (binary). */
  def quantileSketchByGroup(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("kll_sketch_agg_double", col(valueCol).cast("double"), lit(k))
          .as("kll"))

  /** Read quantiles out of a sketched frame: one `p<pct>` column per
    * requested fraction, plus the sketch's own exact item count
    * (`kll_n` — KLL tracks n exactly; only ranks are approximate). */
  def quantilesFromSketch(sketched: DataFrame, ps: Seq[Double]): DataFrame = {
    val qs = ps.map(p =>
      call_function("kll_sketch_get_quantile_double", col("kll"), lit(p))
        .as(s"p${(p * 100).round}"))
    sketched.select(
      sketched.columns.filterNot(_ == "kll").map(col).toSeq ++
        (call_function("kll_sketch_get_n_double", col("kll")).as("kll_n") +: qs): _*)
  }

  /** Roll fine-grain KLL sketches to a coarser grain by merge —
    * kilobytes per group, raw data untouched. */
  def quantileRollup(sketched: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketched.groupBy()
      else sketched.groupBy(groupCols.map(col): _*)
    grouped.agg(sum(col("n_rows")).as("n_rows"),
      call_function("kll_merge_agg_double", col("kll")).as("kll"))
  }

  /** One approx-top-k (frequent-items / space-saving) state per group
    * — the mergeable HEAVY-HITTER companion sketch: "what are the most
    * frequent values of x per group, and globally" from one raw-data
    * pass, merged upward in state-sized (not data-sized) steps via
    * `approx_top_k_combine`. While the number of distinct values stays
    * under `maxTracked`, counts are EXACT (no evictions happen), which
    * is what makes [[graft.SparkEntry]] q_approx_topk oracle-checkable
    * on bounded-cardinality columns; past capacity the space-saving
    * over-estimate bounds apply.
    *
    * Output: groupCols*, n_rows, topk (the accumulate state). */
  def topKSketchByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        maxTracked: Int = 64): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("approx_top_k_accumulate", col(valueCol), lit(maxTracked))
          .as("topk"))

  /** Merge per-group top-k states to a coarser grain. */
  def topKRollup(sketched: DataFrame, groupCols: Seq[String],
                 maxTracked: Int = 64): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketched.groupBy()
      else sketched.groupBy(groupCols.map(col): _*)
    grouped.agg(sum(col("n_rows")).as("n_rows"),
      call_function("approx_top_k_combine", col("topk"), lit(maxTracked)).as("topk"))
  }

  /** Read the top `k` items per group out of a sketched frame with a
    * DETERMINISTIC cut: the estimate is drained fully (capacity items),
    * then re-ranked (count DESC, item ASC) so boundary ties never
    * depend on sketch-internal ordering. Output: groupCols*, item,
    * est_count, rank. */
  def topKFromSketch(sketched: DataFrame, groupCols: Seq[String], k: Int,
                     maxTracked: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val drained = sketched.select(
      groupCols.map(col) :+
        explode(call_function("approx_top_k_estimate", col("topk"), lit(maxTracked)))
          .as("e"): _*)
      .select(groupCols.map(col) :+ col("e.item").as("item") :+
        col("e.count").cast("long").as("est_count"): _*)
    val w =
      if (groupCols.isEmpty) Window.orderBy(col("est_count").desc, col("item").asc)
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("est_count").desc, col("item").asc)
    drained.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Roll fine-grain sketches up to a coarser grain by HLL union —
    * O(groups × sketch bytes), no raw data touched. `allowDifferentLgK`
    * stays false: silently unioning mixed-precision sketches hides a
    * pipeline bug (the estimate degrades to the worst lgK). */
  def rollupSketches(sketched: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketched.groupBy()
      else sketched.groupBy(groupCols.map(col): _*)
    grouped
      .agg(sum(col("n_rows")).as("n_rows"),
        hll_union_agg(col("sketch"), lit(false)).as("sketch"))
      .withColumn("approx_distinct", hll_sketch_estimate(col("sketch")))
  }
}
