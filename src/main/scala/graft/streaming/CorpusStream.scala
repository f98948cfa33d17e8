package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Dedup
import graft.sources.Staging.Snapshottable

/** Streaming corpus ingestion — the LLM-data dedup lane as a
  * Structured Streaming pipeline. Each micro-batch of documents is
  * signed once (MinHash signatures), checked for near-dups against the
  * accumulated signature store, and appended; detected pairs land in a
  * flags table for the downstream keep/drop decision.
  *
  * Scale/semantics contract:
  *   - Per-trigger cost is O(batch): only the fresh batch is signed,
  *     and the banding join is fresh×(fresh∪store) — store×store pairs
  *     were found when those rows were themselves fresh
  *     ([[graft.operators.Dedup.minhashLshPairsIncremental]]).
  *   - Exactly-once via batch-partitioned dynamic overwrite: both
  *     sinks partition by `batch_id` and overwrite only their own
  *     partition, so a retried trigger replaces its previous output
  *     instead of duplicating it (same pattern as
  *     [[TickStream.upsertSinkPartitioned]]).
  *   - A retried batch meeting its own stored copy is harmless: pairs
  *     exclude equal ids, and the store read drops the current
  *     batch_id partition.
  */
object CorpusStream {

  /** Attach to `docs.writeStream`-ready frame; caller picks trigger +
    * start. `docs` must carry (idCol, textCol). */
  def dedupIngest(docs: DataFrame, idCol: String, textCol: String,
                  storePath: String, flagsPath: String, checkpoint: String,
                  n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                  threshold: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // sign once; the snapshot feeds both the pair join and the
        // store append without re-running the shingle/signature pass
        val fresh = Dedup.minhashSignatures(batch, idCol, textCol, n, numHashes)
          .snapshot()
        // an empty signed batch (empty trigger, or every doc below the
        // shingle size) must be a NO-OP: an empty partitioned write
        // would create a schema-less store directory that poisons the
        // next batch's read
        if (!fresh.isEmpty) {
          val store =
            if (TickStream.tableExists(spark, storePath))
              spark.read.parquet(storePath)
                .filter(col("batch_id") =!= batchId)
                .select(col(idCol), col("shingles"), col("sig"))
            else fresh.limit(0)
          val pairs = Dedup.minhashLshPairsIncremental(store, fresh, idCol,
            numHashes, bands, threshold)
            .snapshot() // materialize BEFORE the store append below
          pairs.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(flagsPath)
          fresh.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(storePath)
        }
        ()
      }
}
