package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._
import graft.sources.Staging.Snapshottable

/** Deterministic sampling and split assignment for training-data
  * pipelines.
  *
  * Everything keys off `hash60(id)` — no RNG, no seed state, no
  * dependence on partitioning or cluster size — so a document's
  * split/sample membership is a pure function of its id: stable
  * across runs, engines (the DuckDB oracle computes the same md5
  * arithmetic), incremental loads (new docs never reshuffle old
  * assignments), and join-free to audit. This is the discipline that
  * keeps eval contamination out of a 100 TB corpus: `sample(0.01)`
  * today and `sample(0.02)` next month NEST (the 1% is a subset of
  * the 2%), and a train/val/test split never migrates a document
  * between splits as the corpus grows.
  *
  * All operators are narrow (scan-local filters/projections): no
  * shuffle, full codegen except the md5 call itself.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the id — the atom both
    * operators build on. */
  def hashBucket(id: Column, buckets: Int = 10000): Column =
    hash60(id.cast("string")) % buckets

  /** Deterministic `fraction` sample: keeps ids whose bucket falls
    * below the cut. Samples with larger fractions contain smaller
    * ones (nesting), unlike `df.sample` whose membership changes with
    * partitioning and seed. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < math.round(fraction * buckets))

  /** Deterministic STRATIFIED sample: a per-stratum keep fraction
    * (e.g. downsample boilerplate-heavy web text, keep all code) under
    * the same hash-membership rule as [[sampleByHash]] — so per-class
    * rebalancing inherits every nesting/stability guarantee, and the
    * strata fractions compile to a plan-time CASE over literals: a
    * narrow codegen'd filter, no join, no RNG. Strata absent from
    * `fractions` fall back to `defaultFraction`. */
  def stratifiedByHash(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       buckets: Int = 10000): DataFrame = {
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * buckets))) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), buckets) < cut)
  }

  /** Per-key cap: keep at most `cap` rows per key, chosen by hash
    * order — deterministic corpus BALANCING (cap a dominant domain /
    * source / language so it can't swamp the mixture). The choice is
    * a pure function of (key, id) like everything here, but unlike
    * [[sampleByHash]] membership is NOT stable under growth: a new doc
    * hashing below a kept one displaces it (inherent to any exact
    * top-k). Use fractions when stability matters, caps when the
    * budget is absolute.
    *
    * Scale shape: `row_number ≤ cap` is the rank-limit pattern Spark
    * rewrites to WindowGroupLimit — each map task keeps only its
    * per-key top `cap` BEFORE the shuffle, so a skewed key moves
    * O(cap × tasks) rows, not its full population. */
  /** Mixture RESAMPLING toward target source proportions: the keep
    * fraction per source is min(1, share·N/n_s), so over-represented
    * sources downsample toward their target share and already-scarce
    * sources keep everything (a share can't manufacture data — the
    * standard no-upsampling mixture semantics). Sources absent from
    * `targetShares` drop entirely.
    *
    * Two-phase "train small, broadcast": per-source counts (a
    * sources-sized collect) fix the thresholds in the DRIVER with one
    * fixed double expression per source (mirrored verbatim by the
    * oracle — both engines run the identical IEEE op sequence), then
    * membership is [[hashBucket]] under a plan-time CASE — the same
    * narrow, stable, nesting rule as every sampler here.
    */
  def mixtureSample(docs: DataFrame, idCol: String, sourceCol: String,
                    targetShares: Map[String, Double],
                    buckets: Int = 10000): DataFrame = {
    require(targetShares.nonEmpty, "mixtureSample: need at least one target share")
    val counts = docs
      .filter(col(sourceCol).isInCollection(targetShares.keys.toSeq))
      .groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val cut = counts.foldLeft(lit(-1L)) { case (els, (s, n)) =>
      val t = math.floor(math.min(1.0, targetShares(s) * total / n) * buckets).toLong
      when(col(sourceCol) === s, lit(t)).otherwise(els)
    }
    docs.filter(hashBucket(col(idCol), buckets) < cut)
  }

  /** Temperature-scaled source mixing — the multilingual/multi-domain
    * sampling rule (p_s ∝ n_s^α, α ∈ (0,1]) that upweights scarce
    * sources relative to their natural share: α=1 is proportional
    * sampling, α→0 approaches uniform-over-sources. Per-source keep
    * fraction is min(1, targetRows·w_s/Σw/n_s) with w_s = n_s^α — the
    * no-upsampling semantics of [[mixtureSample]] with temperature
    * weights instead of fixed shares.
    *
    * Same "train small, broadcast" shape as [[mixtureSample]]: the
    * sources-sized count collect fixes integer bucket cuts in the
    * driver (weight sum folded in sorted-source order so the IEEE
    * accumulation order is pinned), then membership is the narrow
    * stable [[hashBucket]] rule. Cross-engine exactness note: `sqrt`
    * is correctly rounded by IEEE 754, `pow` is not — use α = 0.5 (the
    * common "square-root sampling") where bit-reproducibility against
    * another engine matters; other α remain deterministic within the
    * JVM. */
  def temperatureMixture(docs: DataFrame, idCol: String, sourceCol: String,
                         targetRows: Long, alpha: Double = 0.5,
                         buckets: Int = 10000): DataFrame = {
    require(targetRows > 0, s"temperatureMixture: targetRows must be positive")
    require(alpha > 0 && alpha <= 1, s"temperatureMixture: alpha in (0,1], got $alpha")
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val ws = counts.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha) }
    val wsum = ws.foldLeft(0.0)(_ + _)
    val cut = counts.zip(ws).foldLeft(lit(-1L)) { case (els, ((s, n), w)) =>
      val t = math.floor(math.min(1.0, targetRows.toDouble * w / wsum / n) * buckets).toLong
      when(col(sourceCol) === s, lit(t)).otherwise(els)
    }
    docs.filter(hashBucket(col(idCol), buckets) < cut)
  }

  /** Deterministic WEIGHTED sampling: keep a row with probability
    * weight/maxWeight, decided by the id hash — keep iff
    * hash60(id) mod maxWeight < weight. Pure integer comparison (no
    * RNG, no FP), so membership is reproducible in any engine, stable
    * under corpus growth (a doc's fate depends only on its own id and
    * weight), and composable with [[sampleByHash]]'s nested-fraction
    * rule. The standard quality-/length-weighted downsampling step of
    * a training-data mixture: weight = quality score, token count, or
    * any integer utility.
    *
    * One narrow filter evaluated at the scan — no shuffle, no state.
    */
  def weightedByHash(df: DataFrame, idCol: String, weight: Column,
                     maxWeight: Long): DataFrame = {
    require(maxWeight > 0, s"weightedByHash: maxWeight must be positive, got $maxWeight")
    df.filter(hash60(col(idCol).cast("string")) % maxWeight < least(weight, lit(maxWeight)))
  }

  /** Per-source TOKEN-BUDGET cap — the data-mixture primitive that
    * bounds each source's contribution in token space, not row space
    * (a source of long documents otherwise dominates a row cap). Rows
    * are admitted in deterministic hash-of-id order until the running
    * token total exceeds `budget`; the first over-budget doc is
    * included (so a budget below one doc still admits something and
    * every source's total lands in [budget, budget + maxDoc)).
    *
    * Scale shape: ONE exchange on the source key feeds a bounded-state
    * running sum (same shape as every mart window); the admit decision
    * is `cumsum − tokens < budget`, all integers. At 100 TB the
    * per-source partition is the constraint — for a handful of huge
    * sources, pre-aggregate per (source, hash-bucket) and cap buckets.
    */
  def capPerKeyTokens(df: DataFrame, keyCol: String, idCol: String,
                      tokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"capPerKeyTokens: budget must be positive, got $budget")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hash60(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") - col(tokensCol) < budget)
  }

  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0, s"capPerKey: cap must be positive, got $cap")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hash60(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= cap)
  }

  /** Train/val/test assignment: adds `split` from contiguous bucket
    * ranges (train takes [0, train·B), val the next slice, test the
    * rest). Contiguity is what makes splits stable under fraction
    * changes: growing train only ever claims buckets from val's low
    * end, never swaps train↔test. */
  def withSplit(df: DataFrame, idCol: String,
                trainFraction: Double = 0.9, valFraction: Double = 0.05,
                buckets: Int = 10000): DataFrame = {
    require(trainFraction + valFraction <= 1.0, "fractions exceed 1")
    val trainCut = math.round(trainFraction * buckets)
    val valCut = trainCut + math.round(valFraction * buckets)
    df.withColumn("split",
      when(hashBucket(col(idCol), buckets) < trainCut, "train")
        .when(hashBucket(col(idCol), buckets) < valCut, "val")
        .otherwise("test"))
  }

  /** Derandomized Poisson bootstrap: replicate-r weight of a unit is
    * the INVERSE Poisson(1) CDF evaluated at hash60(group|unit|r) %
    * 10⁶ — the online-bootstrap trick (each unit's multiplicity drawn
    * Poisson(1) instead of multinomial, Oza & Russell 2001; Kleiner
    * et al.'s "bag of little bootstraps" scales the same way) with
    * the repo's no-RNG discipline: weights are a pure function of
    * (group, unit, rep), so CIs are replayable bit-for-bit anywhere.
    * The CDF thresholds are INTEGER literals (⌊10⁶·P(K≤k)⌋, w ≤ 5
    * capped); replicate means are exact scaled-long ratios; the CI
    * is the 2.5%/97.5% `percentile` over the B replicate means
    * (dyadic interpolation, identical in DuckDB's quantile_cont).
    *
    * Shape at 100 TB: ONE pass over the unit grain — the B replicate
    * weights are B extra aggregate column pairs (sum w·x, sum w) in a
    * single partial-aggregable groupBy, so shuffle volume is B scalars
    * per group, not B× the rows (an earlier explode(sequence(0,B-1))
    * form paid that fan-out through the shuffle for nothing: the
    * weight is a pure per-row function of (group, unit, rep), so it
    * folds map-side). The final percentile holds B values per group —
    * model-sized. */
  def hashBootstrapCi(df: DataFrame, groupCol: String, unitCol: Column,
                      value4: Column, reps: Int = 20): DataFrame = {
    require(reps >= 4, "hashBootstrapCi: need at least 4 replicates")
    // floor(1e6 * CDF of Poisson(1)) at k = 0..4
    val t = Seq(367879L, 735758L, 919698L, 981011L, 996340L)
    val base = df.select(col(groupCol).as("grp"), unitCol.cast("string").as("unit"),
      value4.as("v4"))
    def w(rep: Int): Column = {
      val h = hash60(concat_ws("|", col("grp"), col("unit"),
        lit(rep).cast("string"))) % 1000000L
      when(h < t(0), 0L).when(h < t(1), 1L)
        .when(h < t(2), 2L).when(h < t(3), 3L)
        .when(h < t(4), 4L).otherwise(5L)
    }
    // Weights PROJECTED once per (row, rep) ahead of the aggregate, on
    // a frame SPREAD across the cores first when the input's file-split
    // layout under-parallelizes it (the [[graft.operators.Dedup
    // .spreadById]] rationale, guide §1.2 "per-task work" / §2.5 input
    // skew): B md5s per row is the lane's dominant CPU, and a compact
    // (grp, unit, v4) mart read arrives as a handful of splits
    // (measured sf0.1: an 11-task scan-fused stage walls 1.4 s with
    // 11 taskSec of md5; spread over 32 it walls ~0.6 s). The exchange
    // ships only the narrow input rows, and ONLY when the scan has
    // fewer splits than the session dial — at real scale the scan is
    // already ≥ cores-many tasks and no exchange is added. Keyed by
    // the fine (grp, unit) grain, so no hot group serializes a task.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val spread =
      if (base.rdd.getNumPartitions < parts)
        base.repartition(parts, col("grp"), col("unit"))
      else base
    val projected = spread.select(
        col("grp") +: col("v4") +:
          (0 until reps).map(b => w(b).as(s"w_$b")): _*)
    val repCols = (0 until reps).flatMap { b =>
      Seq(sum(col(s"w_$b") * col("v4")).as(s"ws_$b"),
        sum(col(s"w_$b")).as(s"wn_$b"))
    }
    val aggs = Seq(
      count(lit(1)).as("n_units"),
      (sum(col("v4")).cast("double") / count(lit(1)).cast("double") / 1e4)
        .as("mean0")) ++ repCols
    // SNAPSHOT the per-group frame (|grp| rows × 2+2·B longs — model-
    // sized): it feeds TWO consumers (the readout projection and the
    // replicate-mean explode), and without materialization each
    // consumer re-runs the whole scan → weight-projection → aggregate
    // chain — the B-md5s-per-row pass, the lane's dominant CPU, paid
    // twice (measured sf0.1: two 32-task ~1 s stages with ~12-20
    // taskSec each; AQE exchange reuse did not dedupe them). Guide
    // §2.4 / §3.3: materialize the branch point.
    val perGroup = projected.groupBy("grp").agg(aggs.head, aggs.tail: _*)
      .snapshot()
    // rep dimension re-materializes here at GROUP grain (|grp|·B rows)
    val repMeans = perGroup.select(col("grp"),
        explode(array((0 until reps).map(b =>
          struct(col(s"ws_$b").as("ws"), col(s"wn_$b").as("wn"))): _*)).as("r"))
      .filter(col("r.wn") > 0L)
      .select(col("grp"),
        (col("r.ws").cast("double") / col("r.wn").cast("double") / 1e4).as("m"))
    perGroup.select(col("grp"), col("n_units"), col("mean0"))
      .join(
        repMeans.groupBy("grp").agg(
          count(lit(1)).as("n_reps"),
          expr("percentile(m, 0.025)").as("lo"),
          expr("percentile(m, 0.975)").as("hi")),
        "grp")
      .select(col("grp"), col("n_units"), col("n_reps"),
        rd(col("mean0"), 4).as("mean"),
        rd(col("lo"), 4).as("ci_lo"), rd(col("hi"), 4).as("ci_hi"))
  }

  /** Fixed-k reservoir sample, hash-ordered: the k rows with the
    * SMALLEST `hash60(id)` — the deterministic equivalent of
    * single-pass reservoir sampling (Vitter, TOMS 1985: bottom-k
    * under a random tape IS a uniform k-subset; here the tape is the
    * id hash, so membership is reproducible, engine-portable, and
    * STABLE under corpus growth in the bottom-k sense: a new row
    * only enters by displacing the current max, exactly the
    * reservoir update rule). Complements [[sampleFraction]]-style
    * rate sampling when the contract is "exactly k rows" (a fixed
    * eval panel, a human-review batch) rather than a rate.
    *
    * Scale shape: Spark plans orderBy+limit as TakeOrderedAndProject
    * — each partition keeps its own top-k heap and the driver merges
    * partitions×k candidate rows, k·P bounded and tiny; the fact
    * table is never globally sorted and never shuffled. Ties are
    * impossible at equal hash because `id` itself breaks them. */
  def reservoirFixedK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "reservoirFixedK: k must be positive")
    df.withColumn("h", hash60(col(idCol).cast("string")))
      .orderBy(col("h"), col(idCol))
      .limit(k)
  }
}
