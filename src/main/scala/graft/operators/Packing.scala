package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Staging.Snapshottable

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

  /** RAG-style sliding-window chunking: each document is cut into
    * `size`-token windows advancing by `size - overlap` tokens, so
    * consecutive chunks share `overlap` tokens of context. Emits one
    * row per (doc, chunk): (id, chunk_idx, tok_start, tok_end, n_toks)
    * with tok_end exclusive and the last chunk clipped to the doc.
    *
    * Unlike [[chunkSpans]] (corpus-level packing, needs a per-shard
    * cumsum exchange), this is per-document integer arithmetic on a
    * token count — a narrow map + explode with NO shuffle at any
    * scale; chunk counts are data-independent given n_tokens, so the
    * operator is trivially deterministic. */
  /** CONTENT-DEFINED chunking: cut after every token whose hash ≡ 0
    * (mod divisor) — boundaries derive from content, not position, so
    * an insertion near the start perturbs only its neighboring chunks
    * while every fixed-stride chunk after the edit would shift
    * (the CDC property that makes chunk-level dedup survive edits;
    * tested). Expected chunk length = divisor tokens.
    *
    * Pure array expressions evaluated once per row — boundary
    * positions, span assembly, and chunk text all inside one narrow
    * codegen'd projection + explode, no shuffle. Only the LAST span
    * can be empty (boundary on the final token), so dropping empty
    * spans never re-indexes earlier chunks.
    *
    * Output: (id, chunk_idx, tok_start, tok_end, chunk_text) with
    * [tok_start, tok_end) 0-based token spans.
    */
  def contentDefinedChunks(docs: DataFrame, idCol: String, textCol: String,
                           divisor: Int = 8): DataFrame = {
    import graft.functions.Funcs.hash60
    require(divisor > 0, s"contentDefinedChunks: divisor must be positive, got $divisor")
    // spread first (single-row-group scans would run the md5-per-token
    // lambda on one task), and tokenize ONCE into a carried array
    // column — the Generate stage forwards it, so the chunk text
    // slices the already-split array instead of re-splitting the
    // document per emitted chunk
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val w = col("__w")
    val bnd = filter(sequence(lit(1), size(w)),
      i => hash60(element_at(w, i)) % divisor === 0)
    val starts = concat(array(lit(0)), bnd)
    val ends = concat(bnd, array(size(w)))
    val spans = filter(zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e"))),
      p => p.getField("s") < p.getField("e"))
    docs.select(col(idCol), col(textCol)).repartition(parts, col(idCol))
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), w, posexplode(spans).as(Seq("chunk_idx", "sp")))
      .select(col(idCol), col("chunk_idx"),
        col("sp.s").cast("long").as("tok_start"),
        col("sp.e").cast("long").as("tok_end"),
        concat_ws(" ", slice(w, col("sp.s") + 1, col("sp.e") - col("sp.s")))
          .as("chunk_text"))
  }

  def chunkWithOverlap(docs: DataFrame, idCol: String, tokensCol: String,
                       size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunkWithOverlap: need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // n_chunks = 1 + ceil(max(toks - size, 0) / stride): windows start
    // at i*stride while they still add ≥1 new token past the overlap.
    docs.select(col(idCol), col(tokensCol).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .withColumn("n_chunks",
        lit(1L) + floor((greatest(col("toks") - size, lit(0L)) + stride - 1) / stride).cast("long"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + size, col("toks")).as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }

  /** Padding-efficiency analysis for PADDED (non-packed) batching —
    * the measurement that motivates length-grouped batching (the
    * "sortish" / bucketed batching every finetuning loader implements):
    * batches of `batchSize` docs pad every member to the batch max,
    * so arrival-order batches waste max−len per doc while
    * length-sorted batches co-locate similar lengths. Both strategies
    * are laid out per `groupCol` shard (the realistic unit — loaders
    * batch within a shard, and it keeps the sort per-partition, never
    * global), then the per-batch (count, max, sum) roll up to ONE row
    * per strategy: (strategy, n_batches, total_tokens, padded_tokens,
    * waste_frac). The saved fraction is the headline a data-loader
    * change ships on.
    *
    * Scale shape: one narrow length projection, then per strategy a
    * window rank inside the shard partition and two partial-aggregable
    * rollups (batch grain → 1 row). No global sort, no explode. */
  def paddingEfficiency(docs: DataFrame, idCol: String, textCol: String,
                        groupCol: String, batchSize: Int = 32): DataFrame = {
    val base = docs.select(col(groupCol).as("grp"), col(idCol).as("id"),
      size(split(col(textCol), " ")).as("len"))
      .snapshot() // both strategy branches re-rank the same projection
    def strategy(name: String, order: Seq[Column]) = {
      val w = Window.partitionBy("grp").orderBy(order: _*)
      base
        .withColumn("rn", row_number().over(w) - 1)
        .withColumn("batch", expr(s"rn DIV $batchSize"))
        .groupBy("grp", "batch")
        .agg(count(lit(1)).as("cnt"), max(col("len")).as("mx"),
          sum(col("len")).as("tot"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("tot")).as("total_tokens"),
          sum(col("cnt") * col("mx")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          graft.functions.Funcs.r4(
            (col("padded_tokens") - col("total_tokens")).cast("double") /
              col("padded_tokens")).as("waste_frac"))
    }
    strategy("arrival", Seq(col("id")))
      .unionByName(strategy("length_sorted", Seq(col("len"), col("id"))))
  }
}
