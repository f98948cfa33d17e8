package graft

import org.scalatest.funspec.AnyFunSpec

/** The cluster-run switch for multi-consumer staging panels
  * ([[graft.sources.Staging]]): `graft.staging.reliable=true` routes
  * every `.snapshot()` through a reliable checkpoint instead of
  * `localCheckpoint`, trading a write to durable storage for
  * executor-loss recovery. Results must be bit-identical either way.
  */
class StagingSpec extends AnyFunSpec {
  import SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  describe("Staging.snapshot reliable mode") {
    it("refuses reliable mode without a checkpoint dir, with a clear message") {
      // must run before any reliable snapshot sets the sticky
      // SparkContext checkpoint dir for this shared JVM
      assume(spark.sparkContext.getCheckpointDir.isEmpty)
      spark.conf.set("graft.staging.reliable", "true")
      try {
        val e = intercept[IllegalStateException] {
          graft.sources.Staging.snapshot(spark.range(3).toDF())
        }
        assert(e.getMessage.contains("graft.staging.dir"))
      } finally spark.conf.unset("graft.staging.reliable")
    }

    it("reliable checkpoints produce identical results on the heaviest shared-panel query") {
      val default = SparkEntry.queries("q_pairs_spread")(spark, dir).collect().toSeq
      val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      try {
        spark.conf.set("graft.staging.reliable", "true")
        spark.conf.set("graft.staging.dir", tmp)
        val reliable = SparkEntry.queries("q_pairs_spread")(spark, dir).collect().toSeq
        assert(reliable.nonEmpty && reliable == default)
      } finally {
        spark.conf.unset("graft.staging.reliable")
        spark.conf.unset("graft.staging.dir")
        new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      }
    }
  }
}
