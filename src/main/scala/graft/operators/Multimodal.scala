package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Funcs._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, frame sampling, and a feature-extraction stage.
  *
  * The decode step is STUBBED (this container ships no image/audio
  * codecs): [[decodeStubFeatures]] derives a deterministic fake
  * feature vector from the payload's content hash. Everything
  * Spark-side — schema, batch iteration, partitioning, frame
  * explosion — is real: swapping the stub for a JNI/codec call (or,
  * in PySpark, a pandas-batched decoder under `mapInPandas`) changes
  * only the marked function.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no
  * row-to-string conversions); frame sampling explodes bounded
  * sequences (frames per doc = ceil(bytes/frameSize)), so the operator
  * is a narrow map + generate with no shuffle; feature extraction is
  * embarrassingly parallel per partition.
  */
object Multimodal {

  val frameSize = 256

  /** Wrap a text column as an opaque binary payload with typed
    * metadata — the ingestion shape for image/audio/video blobs. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit("text/fake").as("mime"),
        ceil(length(col(payloadCol).cast("binary")) / lit(frameSize.toDouble))
          .cast("int").as("n_frames")).as("meta"))

  /** Frame sampling: one row per fixed-size frame with its content
    * hash — e.g. for per-frame features or frame-level dedup. */
  def sampleFrames(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), col("meta.n_frames").as("n_frames"), col("payload"))
      .select(col("media_id"), col("n_frames"),
        // guard n_frames = 0: Spark's sequence(0, -1) auto-steps to
        // [0, -1] instead of returning an empty array
        posexplode(expr(
          s"""case when n_frames <= 0 then array()
             |else transform(sequence(0, n_frames - 1), f -> substring(payload, f * $frameSize + 1, $frameSize))
             |end""".stripMargin))
          .as(Seq("frame_idx", "frame_bytes")))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"),
        md5(col("frame_bytes")).as("frame_hash"))

  /** ===== STUB decode =====
    * A real pipeline would decode `payload` with a codec here and emit
    * pixel/sample features. Deterministic fake: 8 pseudo-features from
    * the md5 of the payload. Same signature a real decoder would have.
    */
  def decodeStubFeatures(media: DataFrame): DataFrame =
    media.withColumn("features",
      transform(sequence(lit(0), lit(7)),
        i => (hash60(concat(md5(col("payload")), i.cast("string"))) % 1000).cast("double") / 1000.0))

  /** ===== STUB resize =====
    * Stand-in for an image/audio resample: keeps every `factor`-th byte
    * of the payload (a real codec would decode → scale → re-encode).
    * Exercises the real Spark shape: binary in, smaller binary out,
    * metadata updated consistently, pure narrow map.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame =
    media
      .withColumn("payload", expr(
        s"""aggregate(
           |  transform(sequence(0, greatest(ceil(length(payload) / $factor) - 1, 0)),
           |            i -> substring(payload, i * $factor + 1, 1)),
           |  cast('' as binary), (acc, b) -> concat(acc, b))""".stripMargin))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        col("meta.mime").as("mime"),
        ceil(length(col("payload")) / lit(frameSize.toDouble)).cast("int").as("n_frames")))

  /** The mapPartitions form of the decode stage — the shape a native
    * (JNI / process-per-partition codec) decoder plugs into. Kept
    * simple: emits (media_id, n_bytes) via the low-level iterator API.
    */
  def decodePartitioned(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("n_bytes", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        // a real decoder would init its codec once per partition here
        rows.map { r => Row(r.getLong(0), r.getAs[Array[Byte]](1).length) }
      }(enc)
  }
}
