package graft

import org.scalatest.funspec.AnyFunSpec
import graft.operators.Compression

class CompressionSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val sample = "the quick brown fox jumps over the lazy dog — twice! " * 20

  describe("codec round trips") {
    it("every codec restores the exact original bytes") {
      val b = sample.getBytes("UTF-8")
      Compression.codecs.foreach { c =>
        val comp = Compression.compress(c, b)
        assert(comp.nonEmpty && !java.util.Arrays.equals(comp, b), c)
        val back = Compression.decompress(c, comp, b.length)
        assert(back.exists(java.util.Arrays.equals(_, b)), s"$c round trip failed")
      }
    }
    it("compressible text actually compresses (repetitive input shrinks)") {
      val b = sample.getBytes("UTF-8")
      Compression.codecs.foreach { c =>
        assert(Compression.compress(c, b).length < b.length, c)
      }
    }
    it("corrupt and wrong-codec blobs degrade to None, never throw") {
      val b = sample.getBytes("UTF-8")
      val junk = Array.fill[Byte](64)(42)
      Compression.codecs.foreach { c =>
        assert(Compression.decompress(c, junk, b.length).isEmpty, s"$c accepted junk")
      }
      // a zstd frame fed to the gzip/snappy decoders must not decode
      val z = Compression.compress("zstd", b)
      assert(Compression.decompress("gzip", z, b.length).isEmpty)
      assert(Compression.decompress("snappy", z, b.length).isEmpty)
      // truncated gzip stream
      val g = Compression.compress("gzip", b)
      assert(Compression.decompress("gzip", g.take(g.length / 2), b.length).isEmpty)
    }
  }

  describe("DataFrame lane") {
    it("compressCorpus ∘ decompressCorpus is the identity with ok=true") {
      val docs = Seq((1L, sample), (2L, ""), (3L, "ünïcødé ☂ text")).toDF("doc_id", "text")
      Compression.codecs.foreach { c =>
        val back = Compression.decompressCorpus(
            Compression.compressCorpus(docs, "doc_id", "text", c),
            "doc_id", "blob", "orig_len", c)
          .orderBy("doc_id")
          .select("text", "ok").as[(String, Boolean)].collect()
        assert(back.forall(_._2), c)
        assert(back.map(_._1).toSeq == Seq(sample, "", "ünïcødé ☂ text"), c)
      }
    }
    it("poison-pill blobs emit ok=false rows instead of failing the stage") {
      val rows = Seq(
        (1L, Compression.compress("gzip", "good".getBytes("UTF-8")), 4),
        (2L, Array.fill[Byte](32)(7), 4)).toDF("doc_id", "blob", "orig_len")
      val out = Compression.decompressCorpus(rows, "doc_id", "blob", "orig_len", "gzip")
        .orderBy("doc_id").select("ok").as[Boolean].collect().toSeq
      assert(out == Seq(true, false))
    }
    it("codecMatrix digests come from the restored bytes") {
      val docs = Seq((7L, sample)).toDF("doc_id", "text")
      val r = Compression.codecMatrix(docs, "doc_id", "text").head()
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest(sample.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(6) == exp && r.getInt(1) == sample.getBytes("UTF-8").length)
    }
  }
}
