package graft

import org.scalatest.funspec.AnyFunSpec
import graft.operators.MergeUpsert

/** MERGE semantics, including the delete clause's version ordering. */
class MergeUpsertSpec extends AnyFunSpec {
  import SharedSpark.spark
  import spark.implicits._

  private val existing = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    .toDF("k", "v", "version")

  describe("mergeUpsert") {
    it("newest version wins per key; unmatched keys insert") {
      val updates = Seq((2L, "b2", 2L), (9L, "new", 2L)).toDF("k", "v", "version")
      val out = MergeUpsert.mergeUpsert(existing, updates, Seq("k"), "version")
        .as[(Long, String, Long)].collect().toSet
      assert(out == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L), (9L, "new", 2L)))
    }
  }

  describe("mergeUpsertDelete") {
    it("a winning tombstone deletes; a stale tombstone loses to a newer update") {
      val updates = Seq(
        (2L, "b", 2L, true),   // newest version is a tombstone -> delete key 2
        (3L, "c", 0L, true),   // STALE tombstone (version 0 < existing 1) -> key 3 survives
        (9L, "new", 2L, false) // plain insert
      ).toDF("k", "v", "version", "is_deleted")
      val out = MergeUpsert.mergeUpsertDelete(existing, updates, Seq("k"),
        "version", "is_deleted")
        .as[(Long, String, Long)].collect().toSet
      assert(out == Set((1L, "a", 1L), (3L, "c", 1L), (9L, "new", 2L)))
    }
  }
}
