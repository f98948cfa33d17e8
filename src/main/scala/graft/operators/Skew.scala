package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-stage salted
  * aggregation. Stage 1 groups by (key, salt) so a hot key's rows
  * spread over `buckets` reducers; stage 2 merges the partials —
  * `buckets` rows per key, trivially cheap.
  *
  * AQE's skew-join handling covers joins; hot GROUP BY keys are still
  * on the user (partial aggregation helps only when upstream
  * partitions already contain the hot key's rows — after an exchange
  * on other columns it can't). Algebraic aggregates (sum/count/min/
  * max) compose exactly; avg = salted sum / salted count.
  */
object Skew {

  /** Σ value per key, skew-safe. `value` must be an algebraic
    * (re-aggregable) column, e.g. a Funcs.scaled long. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                buckets: Int = 16): DataFrame = {
    val salt = pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(buckets))
    df.withColumn("__salt", salt)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum_value"), sum(col("__pn")).as("count_rows"))
  }
}
