package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concatenate-and-chunk sequence packing: lay documents end to end in
  * a deterministic order and cut the stream every `budget` tokens —
  * the standard GPT-style pretraining pack (documents may span a
  * chunk boundary; the trainer masks across the seam or accepts the
  * crossover).
  *
  * Distribution: the corpus shards by hash(id) so every shard packs
  * independently (embarrassingly parallel, no global order), and
  * within a shard the layout order is (id) — deterministic, so the
  * same corpus always yields the same packs (resumable preprocessing).
  * The offsets are one window cumsum over the shard — a single
  * exchange on shard id, bounded state.
  */
object Packing {

  /** Auto-scale target: one shard's window sort stays bounded at
    * ~10M docs regardless of corpus size. */
  private val docsPerShard = 10000000L

  /** Per-doc placement: (id, shard, start_offset, start_chunk,
    * end_chunk) where chunks are `budget`-token windows of the
    * shard's concatenated stream. `end_chunk > start_chunk` marks a
    * boundary-crossing doc.
    *
    * `shards <= 0` (the default) auto-scales to
    * `max(64, ceil(rows / 10M))` via a count — a FIXED shard count
    * would make a single shard's sort slice unbounded as the corpus
    * grows, the classic works-at-sf0.1-dies-at-100TB trap. Pin the
    * count explicitly when pack layout must be reproducible across
    * corpus versions (the shard id feeds the hash bucket, so a changed
    * count changes layout — determinism is per (corpus, shards,
    * budget), tested). */
  def chunkSpans(docs: DataFrame, idCol: String, tokensCol: String,
                 budget: Int, shards: Int = 0): DataFrame = {
    val nShards =
      if (shards > 0) shards
      else math.max(64L, (docs.count() + docsPerShard - 1) / docsPerShard).toInt
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(tokensCol).cast("long").as("tokens"))
      .filter(col("tokens") > 0)
      .withColumn("shard", Sampling.hashBucket(col(idCol), nShards))
      .withColumn("start_offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("start_chunk", floor(col("start_offset") / budget).cast("long"))
      .withColumn("end_chunk",
        floor((col("start_offset") + col("tokens") - 1) / budget).cast("long"))
      .drop("tokens")
  }
}
