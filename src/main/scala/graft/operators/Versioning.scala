package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs.hash60

/** Table-version comparison operators.
  *
  * The reference's warehouse layer rebuilds marts in place (dbt
  * full-refresh / MERGE); a data-lake deployment instead keeps
  * snapshots and needs to answer "what changed between version A and
  * version B" — for incremental downstream refresh, audit, and CDC
  * replay. [[snapshotDiff]] is that primitive.
  */
object Versioning {

  /** Row-level diff of two snapshots of the same logical table:
    * `added` (key only in `newDf`), `removed` (only in `oldDf`),
    * `changed` (key in both, compared columns differ), `unchanged`.
    *
    * Scale shape: each side collapses its compared columns to ONE
    * 60-bit content hash in the scan stage (a narrow codegen'd map —
    * wide rows never travel), then a single full-outer equi join on
    * the key compares longs. With both snapshots bucketed by key —
    * the layout a versioned 100 TB table should have — the join is
    * exchange-free; otherwise it is one co-partitioned shuffle each
    * side, partial-pruned by whatever key predicate the caller adds.
    * The hash is [[graft.functions.Funcs.hash60]] (md5-derived) so an
    * external engine reproduces it bit-for-bit; compared columns are
    * concat_ws-joined with a 0x01 separator (callers pass non-null
    * compare columns; concat_ws drops nulls, so a null-vs-absent
    * distinction needs an explicit sentinel upstream).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(keyCols.map(col) :+
        hash60(concat_ws("\u0001", compareCols.map(col): _*)).as(h): _*)
    val o = hashed(oldDf, "__h_old")
    val n = hashed(newDf, "__h_new")
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__h_old", "__h_new")
  }
}
