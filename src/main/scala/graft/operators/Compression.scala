package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compressed-blob corpus ingestion: a 100 TB text corpus does not
  * arrive as plain strings — it arrives as per-record compressed blobs
  * (zstd WARC payloads, snappy/lz4 Kafka batches, gzip dumps), and the
  * first pipeline stage is a per-row DECOMPRESSION with a poison-pill
  * policy. This module runs the four codecs Spark itself ships
  * (`java.util.zip` gzip from the JDK; zstd-jni, lz4-java, snappy-java
  * from the Spark distribution — the same libraries its shuffle and
  * parquet paths use), as narrow per-partition byte work:
  *
  *  - self-framing codecs (gzip, zstd frames, raw snappy) recover the
  *    uncompressed size from their own headers;
  *  - LZ4 uses the BLOCK format, which stores NO length — the original
  *    length travels alongside the blob, exactly how parquet pages and
  *    Kafka record batches carry lz4 blocks;
  *  - corrupt or wrong-codec blobs decode to null/ok=false instead of
  *    failing the stage (the [[Multimodal.decodeImageFeatures]]
  *    poison-pill policy: at corpus scale some blobs WILL be bad).
  */
object Compression {

  val codecs: Seq[String] = Seq("gzip", "zstd", "lz4", "snappy")

  private[graft] def compress(codec: String, b: Array[Byte]): Array[Byte] =
    codec match {
      case "gzip" =>
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(b); gz.close()
        bos.toByteArray
      case "zstd" => com.github.luben.zstd.Zstd.compress(b)
      case "lz4" => net.jpountz.lz4.LZ4Factory.fastestInstance()
        .fastCompressor().compress(b)
      case "snappy" => org.xerial.snappy.Snappy.compress(b)
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }

  /** `origLen` is REQUIRED for lz4 blocks (no self-framing) and used
    * as a sanity bound for the rest; None = undecodable. */
  private[graft] def decompress(codec: String, b: Array[Byte],
                                origLen: Int): Option[Array[Byte]] =
    try {
      val out = codec match {
        case "gzip" =>
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(b))
          val r = in.readAllBytes(); in.close(); r
        case "zstd" =>
          val n = com.github.luben.zstd.Zstd.getFrameContentSize(b)
          if (n < 0 || n > Int.MaxValue) throw new java.io.IOException("bad zstd frame")
          com.github.luben.zstd.Zstd.decompress(b, n.toInt)
        case "lz4" => net.jpountz.lz4.LZ4Factory.fastestInstance()
          .fastDecompressor().decompress(b, origLen)
        case "snappy" => org.xerial.snappy.Snappy.uncompress(b)
        case other => throw new IllegalArgumentException(s"unknown codec: $other")
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Text → per-row compressed blob (+ the byte length the lz4 path
    * needs downstream). The staging/ingest-side half of the lane. */
  def compressCorpus(df: DataFrame, idCol: String, textCol: String,
                     codec: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("blob", BinaryType),
      StructField("orig_len", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val b = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Row(r.getLong(0), compress(codec, b), b.length)
        }
      }(enc)
  }

  /** Per-row decompression with the poison-pill policy: undecodable
    * blobs emit (null text, ok=false) and the job continues. */
  def decompressCorpus(df: DataFrame, idCol: String, blobCol: String,
                       lenCol: String, codec: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(blobCol), col(lenCol).cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          decompress(codec, r.getAs[Array[Byte]](1), r.getInt(2)) match {
            case Some(b) =>
              Row(r.getLong(0),
                new String(b, java.nio.charset.StandardCharsets.UTF_8), true)
            case None => Row(r.getLong(0), null, false)
          }
        }
      }(enc)
  }

  /** The full codec matrix round-tripped per document in ONE pass:
    * compress + decompress with all four codecs, verify each restores
    * the exact original bytes, and emit the restored text's md5 (from
    * the gzip lane's RESTORED bytes — so the digest only matches the
    * closed form if decode∘encode really is the identity through the
    * codec). One narrow mapPartitions, no shuffle. */
  def codecMatrix(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("orig_len", IntegerType),
      StructField("gzip_ok", BooleanType),
      StructField("zstd_ok", BooleanType),
      StructField("lz4_ok", BooleanType),
      StructField("snappy_ok", BooleanType),
      StructField("restored_md5", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val b = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          def rt(c: String): Option[Array[Byte]] =
            decompress(c, compress(c, b), b.length).filter(java.util.Arrays.equals(_, b))
          val restored = rt("gzip")
          md.reset()
          val digest = restored.map(x => md.digest(x).map("%02x".format(_)).mkString)
          Row(r.getLong(0), b.length, restored.isDefined, rt("zstd").isDefined,
            rt("lz4").isDefined, rt("snappy").isDefined, digest.orNull)
        }
      }(enc)
  }
}
