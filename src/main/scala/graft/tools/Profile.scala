package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc profiler for the heavy dedup queries (not part of the driver
  * contract; run manually: runMain graft.tools.Profile <sfDir>). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", 32)
      // subset co-partitioning (both join children hashed on the SAME
      // subset of join keys) is what the blocked pair join relies on —
      // the bucketed-join dial
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    docs.count() // warm scan

    for (rep <- 1 to 2) {
      time(s"minhash FULL #$rep")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
      time(s"ngram prefix FULL #$rep")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text").count())
      time(s"ngram plain FULL #$rep")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
      time(s"simhash FULL #$rep")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
