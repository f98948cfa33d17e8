package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped ranking operators. */
object Ranking {

  /** Top-k rows per group under a total order — the grouped-limit
    * primitive behind "best n per key" marts ([[Dedup.keepFirst]] is
    * the k = 1 special case). Emits the rank as `rnk` (1-based).
    *
    * Scale shape: `row_number` over (keys, order) triggers Spark's
    * rank-pushdown — a partial WindowGroupLimit runs BEFORE the
    * exchange, so each map task forwards at most k rows per group
    * instead of the whole partition (asserted in PlanSpec). One
    * exchange on the group keys, bounded state per group.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
