package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog sat of the mat in a box"),
    (2L, "der hund und die katze ist ein tier"),
    (3L, "xyzzy qwerty plugh"))
    .toDF("doc_id", "text")

  describe("TextAnalysis") {
    it("language ID picks the dominant stopword profile") {
      val out = TextAnalysis.languageId(docs, "text")
        .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
      assert(out(1L) == "en")
      assert(out(2L) == "de")
      assert(out(3L) == "und") // no stopwords at all
    }
    it("token stats: counts, diversity, subwords") {
      val row = TextAnalysis.tokenStats(docs, "text").filter($"doc_id" === 1).head()
      assert(row.getAs[Int]("n_tokens") == 12)
      assert(row.getAs[Int]("n_distinct_tokens") == 10) // 'the' ×3
      assert(row.getAs[Int]("n_subword_tokens") == 12)  // pure [a-z ] text
    }
    it("quality score is in [0,1] and higher for stopword-rich text") {
      val q = TextAnalysis.qualityScore(docs, "text")
        .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
      assert(q.values.forall(v => v >= 0 && v <= 1))
      assert(q(1L) > q(3L))
    }
    it("token rarity: shared vocabulary scores higher mean_df than a gibberish doc") {
      val corpus = Seq(
        (1L, "the market rose today"), (2L, "the market fell today"),
        (3L, "the market was flat today"),
        (4L, "zxqv wkjp qqzz mmvv")) // vocabulary nothing else shares
        .toDF("doc_id", "text")
      val r = TextAnalysis.tokenRarity(corpus, "doc_id", "text")
        .select("doc_id", "mean_df").as[(Long, Double)].collect().toMap
      assert(r(4L) == 1.0) // every token appears in exactly its own doc
      assert(Seq(1L, 2L, 3L).forall(id => r(id) > 2.0), r.toString)
    }
  }

  describe("Multimodal") {
    lazy val media = Multimodal.asMedia(docs, "doc_id", "text")

    it("binary payload round-trips with byte-exact metadata") {
      val m = media.filter($"media_id" === 1).head()
      val meta = m.getStruct(m.fieldIndex("meta"))
      assert(meta.getAs[Int]("n_bytes") == "the cat and the dog sat of the mat in a box".length)
      assert(meta.getAs[Int]("n_frames") == 1)
    }
    it("frame sampling covers the payload exactly once") {
      val big = Seq((9L, "ab" * 400)).toDF("doc_id", "text") // 800 bytes → 4 frames
      val frames = Multimodal.sampleFrames(Multimodal.asMedia(big, "doc_id", "text"))
      assert(frames.count() == 4)
      assert(frames.agg(sum("frame_len")).as[Long].head() == 800)
    }
    it("empty payloads produce zero frames (sequence(0,-1) guard)") {
      val empty = Seq((9L, "")).toDF("doc_id", "text")
      assert(Multimodal.sampleFrames(Multimodal.asMedia(empty, "doc_id", "text")).isEmpty)
    }
    it("resize stub shrinks payloads and keeps metadata consistent") {
      val big = Seq((9L, "abcdefghij" * 10)).toDF("doc_id", "text") // 100 bytes
      val resized = Multimodal.resizeStub(Multimodal.asMedia(big, "doc_id", "text"), 4)
      val row = resized.head()
      assert(row.getAs[Array[Byte]]("payload").length == 25)
      assert(row.getStruct(row.fieldIndex("meta")).getAs[Int]("n_bytes") == 25)
      // every 4th byte: a, e, i, c, ...
      assert(new String(row.getAs[Array[Byte]]("payload")).startsWith("aei"))
    }
    it("stub decode emits deterministic bounded features") {
      val f = Multimodal.decodeStubFeatures(media)
        .select("features").as[Seq[Double]].collect()
      assert(f.forall(v => v.length == 8 && v.forall(x => x >= 0 && x < 1)))
      val again = Multimodal.decodeStubFeatures(media)
        .select("features").as[Seq[Double]].collect()
      assert(f.toSeq == again.toSeq)
    }
    it("mapPartitions decode plumbing preserves rows") {
      assert(Multimodal.decodePartitioned(media).count() == 3)
    }
  }
}
