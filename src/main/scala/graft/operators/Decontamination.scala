package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs._

/** Eval-set decontamination: flag corpus documents that share too much
  * n-gram surface with a benchmark/eval set — the step that keeps
  * test data out of a training corpus.
  *
  * Shape at 100 TB: the EVAL side is small (benchmarks are thousands
  * of docs), so its distinct shingle-hash set broadcasts; the corpus
  * side is one explode → broadcast-hash semi-match → per-doc count.
  * No corpus-side shuffle except the per-doc count aggregation, which
  * partial-aggregates map-side. Shingles travel as 60-bit hashes
  * (never strings), computed once per (doc, shingle).
  */
object Decontamination {

  /** Per-corpus-doc overlap against the eval set's shingle universe:
    * (id, n_shingles, matched, overlap_ratio). `overlap_ratio` is the
    * fraction of the doc's distinct n-grams that appear ANYWHERE in
    * the eval set — the standard contamination score; callers
    * threshold it (0.8 catches verbatim inclusions, 0.2 catches
    * paraphrase-with-quotes). */
  def contaminationScores(corpus: DataFrame, idCol: String, textCol: String,
                          evalDocs: DataFrame, evalTextCol: String,
                          n: Int = 3): DataFrame = {
    // spread the corpus before the interpreted shingle lambda (same
    // rationale as Dedup.spreadById: explicit partition count so the
    // CPU-bound stage parallelizes regardless of file-split layout)
    val ex = Dedup.withShingles(Dedup.spreadById(corpus, idCol, textCol), textCol, n)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), explode(col("shingles")).as("s"))
      .select(col(idCol), hash60(col("s")).as("sh"))
    val evalSh = Dedup.withShingles(evalDocs.select(col(evalTextCol)), evalTextCol, n)
      .select(explode(col("shingles")).as("s"))
      .select(hash60(col("s")).as("sh"))
      .distinct()
    ex.join(broadcast(evalSh).withColumn("__hit", lit(1)), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("matched"))
      .select(col(idCol), col("n_shingles"), col("matched"),
        r4(col("matched") / col("n_shingles").cast("double")).as("overlap_ratio"))
  }

  /** [[contaminationScores]] with a BLOOM-FILTER prefilter on the
    * corpus side — the shape for when the eval shingle universe is too
    * big to ship as a broadcast-hash relation (a full benchmark stack
    * is easily 10⁸ shingles ≈ GBs hashed, but ~7 bits/item ≈ tens of
    * MB as a bloom). The bloom is built in ONE partial-aggregable pass
    * over the eval side (Spark's own BloomFilterAggregate, exposed as
    * `bloom_filter_agg` by [[graft.plans.GraftExtensions]]), collected
    * once (bounded by numBits, not data — "train small, broadcast"),
    * and embedded as a binary literal, so the corpus scan stays one
    * narrow filter pass. Only the surviving ~fpp fraction re-joins the
    * eval set for exact verification — a bloom has NO false negatives,
    * so the result is IDENTICAL to [[contaminationScores]] (tested;
    * same oracle), only the plan changes.
    */
  def contaminationScoresBloom(corpus: DataFrame, idCol: String, textCol: String,
                               evalDocs: DataFrame, evalTextCol: String,
                               n: Int = 3): DataFrame = {
    val ex = Dedup.withShingles(Dedup.spreadById(corpus, idCol, textCol), textCol, n)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), explode(col("shingles")).as("s"))
      .select(col(idCol), hash60(col("s")).as("sh"))
    val evalSh = Dedup.withShingles(evalDocs.select(col(evalTextCol)), evalTextCol, n)
      .select(explode(col("shingles")).as("s"))
      .select(hash60(col("s")).as("sh"))
      .distinct()
    // the two eval-side jobs (count + bloom build) are bounded by the
    // EVAL corpus — small by construction; default sizing ≈ 7.2
    // bits/item at 3% fpp (Spark's BloomFilter.optimalNumOfBits)
    val nEval = math.max(evalSh.count(), 1L)
    val bloom = evalSh
      .agg(call_function("bloom_filter_agg", col("sh"), lit(nEval)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val totals = ex.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    // narrow prefilter (no false negatives) → exact verify on the
    // survivors only; NOT broadcast by hint — the premise is an eval
    // side above the broadcast threshold (AQE may still choose to)
    val matched = ex
      .filter(call_function("bloom_might_contain", lit(bloom), col("sh")))
      .join(evalSh, "sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("matched"))
    totals.join(matched, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        r4(coalesce(col("matched"), lit(0L)) / col("n_shingles").cast("double")).as("overlap_ratio"))
  }
}
