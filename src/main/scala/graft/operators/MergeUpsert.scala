package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native replacement for the reference's row-by-row Snowflake
  * MERGE upsert (S6 — load_to_snowflake.py:40-54,77-95, keyed
  * (SYMBOL, DATE) with one network round-trip per row, the reference's
  * scalability cliff).
  *
  * Here: `existing ∪ updates` → keep the newest version per key via a
  * bounded window — one shuffle on the merge key, fully distributed,
  * no driver loop. At warehouse scale you would additionally partition
  * the output by a date column so the rewrite touches only affected
  * partitions (dynamic partition overwrite).
  */
object MergeUpsert {

  /** Keep the row with the highest `versionCol` per `keys`. Ties break
    * toward `updates` only if version values differ — callers must
    * supply a monotonically increasing version (e.g. load timestamp)
    * for deterministic results.
    */
  def mergeUpsert(existing: DataFrame, updates: DataFrame,
                  keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    existing.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full MERGE semantics including the delete clause:
    *   WHEN MATCHED AND <deleteCol> THEN DELETE
    *   WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT
    * Updates carry a boolean `deleteCol` marking tombstones (the CDC
    * convention — deletes arrive as flagged rows, not absences).
    * Implementation stays ONE shuffle on the merge key: union → keep
    * newest version per key ([[mergeUpsert]]'s window) → drop rows
    * whose WINNING version is a tombstone. A tombstone only deletes if
    * it is the newest version — a late-arriving stale delete loses to
    * a newer update, matching warehouse MERGE applied in version order.
    */
  def mergeUpsertDelete(existing: DataFrame, updates: DataFrame,
                        keys: Seq[String], versionCol: String,
                        deleteCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    existing.withColumn(deleteCol, lit(false))
      .unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deleteCol))
      .drop("__rn", deleteCol)
  }
}
